package graft.text

import graft.core.Py

/** Single-pass HTML → readable-text extraction.
  *
  * Reproduces the observable composition of the reference's `clean_html` +
  * `extract_readable_text` (`/root/reference/web_scraper_pipeline.py:72-92`):
  *
  *  1. every `script/style/noscript/header/footer/nav/aside` subtree is
  *     removed (`:76` decompose);
  *  2. elements matching the whitelist `h1..h6, p, li` are visited in
  *     document order — INCLUDING nested matches: bs4 `find_all` returns an
  *     `li` nested inside another `li`'s subtree as its own hit, so its text
  *     appears twice in the output (`:88`, quirk pinned in SURVEY.md §2.1-R5);
  *  3. per element, `get_text(strip=True, separator=" ")`: every descendant
  *     text node is Python-stripped, empties dropped, survivors joined with a
  *     single space (`:89`);
  *  4. empty results dropped, elements joined with "\n" (`:90-92`).
  *
  * The reference parses with lxml TWICE (clean re-serializes `str(soup)` then
  * extract re-parses). Since `str(soup)` of an lxml tree re-parses to the same
  * tree, a single pass is output-equivalent (SURVEY.md §4.1); the rebuild does
  * clean+extract in one scan with no DOM materialization at all — O(n) time,
  * O(depth) extra space per row, which is what lets this run inside
  * whole-stage codegen over 100 TB of html bytes.
  *
  * Scope: the well-formed HTML subset produced by [[graft.fixtures.PageGen]]
  * (FIXTURES.md §2). bs4+lxml error recovery on arbitrary broken HTML is
  * deliberately out of scope (SURVEY.md §7.3).
  */
object HtmlText {

  // precompiled (String.replaceAll would compile per call; this runs per
  // extracted anchor)
  private val AnyWhitespace = java.util.regex.Pattern.compile("\\s+")

  private val StripTags: Set[String] =
    Set("script", "style", "noscript", "header", "footer", "nav", "aside")

  private val Whitelist: Set[String] =
    Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "li")

  /** Tags that never take content (void elements) in our subset. */
  private val VoidTags: Set[String] =
    Set("br", "hr", "img", "meta", "link", "input", "area", "base", "col",
      "embed", "source", "track", "wbr")

  /** Common named entities beyond the XML five + nbsp (the web-text set a
    * Common-Crawl extractor meets constantly; values = Python
    * `html.unescape` for the same names — parity with the reference's bs4
    * output). Numeric forms (`&#8212;` / `&#x2014;`) were already decoded.
    */
  private val NamedEntities: Map[String, Char] = Map(
    "mdash" -> '—', "ndash" -> '–', "hellip" -> '…',
    "lsquo" -> '‘', "rsquo" -> '’',
    "ldquo" -> '“', "rdquo" -> '”',
    "copy" -> '©', "reg" -> '®', "trade" -> '™',
    "deg" -> '°', "middot" -> '·', "bull" -> '•',
    "laquo" -> '«', "raquo" -> '»',
    "times" -> '×', "divide" -> '÷', "plusmn" -> '±',
    "frac12" -> '½', "frac14" -> '¼', "sup2" -> '²',
    "sup3" -> '³', "micro" -> 'µ', "para" -> '¶',
    "sect" -> '§', "dagger" -> '†', "euro" -> '€',
    "pound" -> '£', "yen" -> '¥', "cent" -> '¢',
    "szlig" -> 'ß', "eacute" -> 'é', "egrave" -> 'è',
    "agrave" -> 'à', "uuml" -> 'ü', "ouml" -> 'ö',
    "auml" -> 'ä', "ntilde" -> 'ñ', "ccedil" -> 'ç')

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 8) {
          s.substring(i + 1, semi) match {
            case "amp" => sb.append('&'); i = semi + 1
            case "lt" => sb.append('<'); i = semi + 1
            case "gt" => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "apos" => sb.append('\''); i = semi + 1
            case "nbsp" => sb.append(' '); i = semi + 1
            case ent if NamedEntities.contains(ent) =>
              sb.append(NamedEntities(ent)); i = semi + 1
            case ent if ent.startsWith("#") =>
              val code =
                try {
                  if (ent.length > 1 && (ent.charAt(1) == 'x' || ent.charAt(1) == 'X'))
                    Integer.parseInt(ent.substring(2), 16)
                  else Integer.parseInt(ent.substring(1))
                } catch { case _: NumberFormatException => -1 }
              if (code >= 0) { sb.appendCodePoint(code); i = semi + 1 }
              else { sb.append(c); i += 1 }
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Index of the tag-closing '>' at or after `from`, skipping quoted
    * attribute values — a '>' inside `title="a>b"` does not end the tag
    * (the HTML5 tokenizer's attribute-value states). −1 if none.
    */
  private def tagEnd(html: String, from: Int): Int = {
    var i = from
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '"' || c == '\'') {
        val end = html.indexOf(c, i + 1)
        if (end < 0) return -1
        i = end + 1
      } else if (c == '>') return i
      else i += 1
    }
    -1
  }

  /** Raw-text elements: their content is TEXT to the tokenizer (HTML5
    * script/style data states), so `<p>` or a stray quote inside a JS
    * string must not be tokenized as markup — the element ends only at its
    * literal close tag.
    */
  private val RawTextTags: Set[String] = Set("script", "style", "noscript")

  /** Index JUST PAST the matching `</name …>` close tag at or after `from`;
    * −1 if the document ends first (caller treats the rest as the element).
    */
  private def closeOf(html: String, from: Int, name: String): Int = {
    var i = from
    val n = html.length
    while (i < n) {
      val lt = html.indexOf("</", i)
      if (lt < 0) return -1
      if (html.regionMatches(true, lt + 2, name, 0, name.length)) {
        val after = lt + 2 + name.length
        if (after < n && (html.charAt(after) == '>' || Character.isWhitespace(html.charAt(after)))) {
          val gt = html.indexOf('>', after)
          return if (gt < 0) -1 else gt + 1
        }
      }
      i = lt + 2
    }
    -1
  }

  /** One whitelisted element mid-collection. */
  private final class Collector(val order: Int) {
    val parts = new java.lang.StringBuilder(64)
    def add(stripped: String): Unit = {
      if (parts.length() > 0) parts.append(' ')
      parts.append(stripped)
    }
  }

  /** Extract readable text (strip-tags removed, whitelist collected). */
  def extract(html: String): String = {
    if (html == null) return null
    val n = html.length
    var i = 0
    var stripDepth = 0 // >0 → inside a removed subtree
    var order = 0
    // stack of (tagName, collectorOrNull) for open elements we care about
    val tagStack = new scala.collection.mutable.ArrayBuffer[String](16)
    val openCollectors = new scala.collection.mutable.ArrayBuffer[Collector](8)
    val collectorDepth = new scala.collection.mutable.ArrayBuffer[Int](8) // tagStack size at open
    val done = new scala.collection.mutable.ArrayBuffer[(Int, String)](32)

    def emitText(raw: String): Unit = {
      if (stripDepth > 0 || openCollectors.isEmpty) return
      val stripped = Py.strip(decodeEntities(raw))
      if (stripped.nonEmpty) {
        var k = 0
        while (k < openCollectors.length) { openCollectors(k).add(stripped); k += 1 }
      }
    }

    def closeTag(name: String): Unit = {
      // pop until matching open tag (tolerates our well-formed subset)
      var idx = tagStack.lastIndexOf(name)
      if (idx < 0) return
      while (tagStack.length > idx) {
        tagStack.remove(tagStack.length - 1)
        if (collectorDepth.nonEmpty && collectorDepth.last == tagStack.length) {
          collectorDepth.remove(collectorDepth.length - 1)
          val c = openCollectors.remove(openCollectors.length - 1)
          val text = c.parts.toString
          if (text.nonEmpty) done += ((c.order, text))
        }
      }
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { emitText(html.substring(i)); i = n }
      else {
        if (lt > i) emitText(html.substring(i, lt))
        if (lt + 1 < n && html.charAt(lt + 1) == '!') {
          // comment, CDATA section, or doctype
          if (html.startsWith("<!--", lt)) {
            val end = html.indexOf("-->", lt + 4)
            i = if (end < 0) n else end + 3
          } else if (html.startsWith("<![CDATA[", lt)) {
            // skipped wholesale to ']]>' — its content may contain '>' and
            // tag-shaped text that must not be tokenized (FIXTURES.md §2)
            val end = html.indexOf("]]>", lt + 9)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', lt)
            i = if (end < 0) n else end + 1
          }
        } else {
          val gt = tagEnd(html, lt + 1)
          if (gt < 0) { i = n }
          else {
            val inner = html.substring(lt + 1, gt)
            val closing = inner.startsWith("/")
            val selfClosed = inner.endsWith("/")
            val body = inner.stripPrefix("/").stripSuffix("/")
            val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
            val name = (if (sp < 0) body else body.substring(0, sp)).toLowerCase(java.util.Locale.ROOT)
            var nextI = gt + 1
            if (name.isEmpty) { /* stray '<>' — ignore */ }
            else if (closing) {
              if (StripTags.contains(name)) {
                if (stripDepth > 0) stripDepth -= 1
              } else if (stripDepth == 0) closeTag(name)
            } else if (selfClosed || VoidTags.contains(name)) {
              // <br/> acts as a text-node separator in bs4 (no string content)
            } else if (RawTextTags.contains(name)) {
              // raw-text strip element: content is DATA, not markup — jump
              // straight past the literal close tag so a '<p>' or stray
              // quote inside JS/CSS can neither leak text nor desync the
              // tokenizer (all three are also StripTags: nothing is kept)
              val end = closeOf(html, gt + 1, name)
              nextI = if (end < 0) n else end
            } else if (StripTags.contains(name)) {
              stripDepth += 1
            } else if (stripDepth == 0) {
              tagStack += name
              if (Whitelist.contains(name)) {
                val c = new Collector(order); order += 1
                openCollectors += c
                collectorDepth += tagStack.length - 1
              }
              // raw-text elements we also skip wholesale when stripping is off
              // (title etc. are not whitelisted so their text only leaks into
              // an enclosing whitelisted element — matches bs4)
            }
            i = nextI
          }
        }
      }
    }
    // close any still-open collectors (unclosed trailing elements)
    while (openCollectors.nonEmpty) {
      val c = openCollectors.remove(openCollectors.length - 1)
      val text = c.parts.toString
      if (text.nonEmpty) done += ((c.order, text))
    }
    done.sortInPlaceBy(_._1).iterator.map(_._2).mkString("\n")
  }

  /** All `<a href>` attribute values in document order (entities decoded,
    * duplicates preserved — dedup is the frontier's job, not the parser's).
    * The reference crawler never discovers links (its URL list is fixed,
    * `web_scraper_pipeline.py:41-56`), so these semantics are the rebuild's
    * own: raw attribute bytes out, resolution/canonicalization downstream
    * ([[graft.url.UrlKit.resolve]]).
    */
  def extractLinks(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        // a commented-out <a href> is not a link (bs4 parses comments as
        // Comment nodes, find_all('a') never sees them)
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (lt + 2 < n && (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A')
          && Character.isWhitespace(html.charAt(lt + 2))) {
        val gt = tagEnd(html, lt + 1) // quote-aware: href values may hold '>'
        if (gt < 0) i = n
        else {
          val href = findHref(html, lt + 2, gt)
          if (href != null) out += decodeEntities(href)
          i = gt + 1
        }
      } else {
        val gt = tagEnd(html, lt + 1)
        if (gt < 0) i = n
        else {
          // raw-text elements: an '<a href>' inside JS/CSS source is data,
          // not a link — jump past the literal close tag (same rule the
          // extractor applies)
          val inner = html.substring(lt + 1, gt)
          val body = inner.stripPrefix("/").stripSuffix("/")
          val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
          val name = (if (sp < 0) body else body.substring(0, sp))
            .toLowerCase(java.util.Locale.ROOT)
          if (!inner.startsWith("/") && !inner.endsWith("/") && RawTextTags.contains(name)) {
            val end = closeOf(html, gt + 1, name)
            i = if (end < 0) n else end
          } else i = gt + 1
        }
      }
    }
    out.result()
  }

  /** All (href, anchor-text) pairs of `<a href>` elements in document
    * order — the web-search signal ("what the rest of the web calls this
    * page") that a training-data pipeline aggregates into titles/queries
    * for link targets. Same scanner discipline as [[extractLinks]]
    * (comment-blind, quote-aware tag ends, raw-text bodies jumped), plus
    * the anchor-body rules:
    *
    *  - text runs to the matching `</a>`, with inner tag spans (`<b>`,
    *    `<img …>`, comments) removed and raw-text bodies skipped;
    *  - a nested `<a` OPEN tag closes the current anchor first (browsers'
    *    implicit-close rule — anchors cannot nest), and the scan resumes
    *    at that tag so the new anchor is captured too;
    *  - entities decode, then java-regex `\s` runs collapse to single
    *    spaces and trim (the repo's pinned separator class) — an
    *    image-only/empty anchor yields "".
    */
  def extractAnchors(html: String): Vector[(String, String)] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[(String, String)]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (lt + 2 < n && (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A')
          && Character.isWhitespace(html.charAt(lt + 2))) {
        val gt = tagEnd(html, lt + 1)
        if (gt < 0) i = n
        else {
          val href = findHref(html, lt + 2, gt)
          if (href == null) i = gt + 1
          else {
            val sb = new java.lang.StringBuilder
            var j = gt + 1
            var open = true
            while (open && j < n) {
              val lt2 = html.indexOf('<', j)
              if (lt2 < 0) { sb.append(html, j, n); j = n }
              else {
                sb.append(html, j, lt2)
                if (html.startsWith("<!--", lt2)) {
                  val e = html.indexOf("-->", lt2 + 4)
                  j = if (e < 0) n else e + 3
                } else {
                  val gt2 = tagEnd(html, lt2 + 1)
                  if (gt2 < 0) j = n
                  else {
                    val inner = html.substring(lt2 + 1, gt2)
                    val body = inner.stripPrefix("/").stripSuffix("/")
                    val sp = body.indexWhere(ch =>
                      ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
                    val name = (if (sp < 0) body else body.substring(0, sp))
                      .toLowerCase(java.util.Locale.ROOT)
                    if (name == "a") {
                      open = false
                      // implicit close on a nested open: resume AT the new
                      // `<a` so the outer loop captures it as its own anchor
                      j = if (inner.startsWith("/")) gt2 + 1 else lt2
                    } else if (!inner.startsWith("/") && !inner.endsWith("/") &&
                        RawTextTags.contains(name)) {
                      val e = closeOf(html, gt2 + 1, name)
                      j = if (e < 0) n else e
                    } else j = gt2 + 1
                  }
                }
              }
            }
            val text = AnyWhitespace.matcher(decodeEntities(sb.toString))
              .replaceAll(" ").trim
            out += ((decodeEntities(href), text))
            i = j
          }
        }
      } else {
        val gt = tagEnd(html, lt + 1)
        if (gt < 0) i = n
        else {
          val inner = html.substring(lt + 1, gt)
          val body = inner.stripPrefix("/").stripSuffix("/")
          val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
          val name = (if (sp < 0) body else body.substring(0, sp))
            .toLowerCase(java.util.Locale.ROOT)
          if (!inner.startsWith("/") && !inner.endsWith("/") && RawTextTags.contains(name)) {
            val end = closeOf(html, gt + 1, name)
            i = if (end < 0) n else end
          } else i = gt + 1
        }
      }
    }
    out.result()
  }

  final case class Directives(noindex: Boolean, nofollow: Boolean, canonical: String)

  /** Page-level crawl directives — the two signals a polite crawler must
    * read out of the page itself: `<meta name="robots" content="…">`
    * (noindex / nofollow / none tokens, any case, first meta wins — the
    * rule browsers and Googlebot apply) and `<link rel="canonical"
    * href="…">` (the duplicate-cluster representative the SITE declares,
    * first link wins). Same scanner discipline as [[extractLinks]]:
    * comment-blind, raw-text bodies jumped, quote-aware tag ends.
    * `canonical` is the raw attribute value ("" if absent) — resolution
    * belongs downstream like every other discovered URL.
    */
  def pageDirectives(html: String): Directives = {
    if (html == null) return Directives(noindex = false, nofollow = false, "")
    // fast path: a page with neither substring cannot carry a directive —
    // the COMMON page pays one allocation-free case-blind scan instead of
    // the tag walk (which substrings every tag); a body-text false hit
    // just takes the slow path, same answer
    if (indexOfIgnoreCase(html, "robots") < 0 &&
        indexOfIgnoreCase(html, "canonical") < 0)
      return Directives(noindex = false, nofollow = false, "")
    var noindex = false; var nofollow = false; var canonical = ""
    var sawRobots = false; var sawCanonical = false
    val n = html.length
    var i = 0
    while (i < n && !(sawRobots && sawCanonical)) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else {
        val gt = tagEnd(html, lt + 1)
        if (gt < 0) i = n
        else {
          val inner = html.substring(lt + 1, gt)
          val body = inner.stripPrefix("/").stripSuffix("/")
          val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
          val name = (if (sp < 0) body else body.substring(0, sp))
            .toLowerCase(java.util.Locale.ROOT)
          if (!inner.startsWith("/") && name == "meta" && !sawRobots) {
            val nm = findAttr(html, lt + 5, gt, "name")
            if (nm != null && nm.trim.equalsIgnoreCase("robots")) {
              sawRobots = true
              val content = findAttr(html, lt + 5, gt, "content")
              if (content != null) {
                val toks = decodeEntities(content).toLowerCase(java.util.Locale.ROOT)
                  .split(',').map(_.trim).toSet
                noindex = toks.contains("noindex") || toks.contains("none")
                nofollow = toks.contains("nofollow") || toks.contains("none")
              }
            }
            i = gt + 1
          } else if (!inner.startsWith("/") && name == "link" && !sawCanonical) {
            val rel = findAttr(html, lt + 5, gt, "rel")
            if (rel != null && rel.trim.equalsIgnoreCase("canonical")) {
              sawCanonical = true
              val href = findAttr(html, lt + 5, gt, "href")
              if (href != null) canonical = decodeEntities(href)
            }
            i = gt + 1
          } else if (!inner.startsWith("/") && !inner.endsWith("/") &&
              RawTextTags.contains(name)) {
            val end = closeOf(html, gt + 1, name)
            i = if (end < 0) n else end
          } else i = gt + 1
        }
      }
    }
    Directives(noindex, nofollow, canonical)
  }

  /** `<link rel="alternate" hreflang="…" href="…">` declarations in
    * document order — the multilingual alternate graph (the hreflang
    * annotations search engines use to group translations of one page;
    * a multilingual corpus pipeline uses them to balance languages
    * WITHOUT near-dup-detecting across languages, which content hashing
    * cannot do). Same scanner discipline as [[pageDirectives]]:
    * comment-blind, raw-text bodies jumped, quote-aware tag ends, `rel`
    * treated as a space-separated token SET (so `rel="alternate
    * stylesheet"` still matches — the WHATWG link-type rule). Entries
    * missing either attribute are skipped; `href` is the raw decoded
    * attribute — resolution belongs downstream like every discovered URL.
    * Fast path: no "hreflang" substring → no allocation-free tag walk.
    */
  def hreflangAlternates(html: String): Vector[(String, String)] = {
    if (html == null) return Vector.empty
    if (indexOfIgnoreCase(html, "hreflang") < 0) return Vector.empty
    val out = Vector.newBuilder[(String, String)]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else {
        val gt = tagEnd(html, lt + 1)
        if (gt < 0) i = n
        else {
          val inner = html.substring(lt + 1, gt)
          val body = inner.stripPrefix("/").stripSuffix("/")
          val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
          val name = (if (sp < 0) body else body.substring(0, sp))
            .toLowerCase(java.util.Locale.ROOT)
          if (!inner.startsWith("/") && name == "link") {
            val rel = findAttr(html, lt + 5, gt, "rel")
            val relToks = if (rel == null) Set.empty[String]
              else rel.toLowerCase(java.util.Locale.ROOT)
                .split("[ \t\n\r]+").filter(_.nonEmpty).toSet
            if (relToks.contains("alternate")) {
              val lang = findAttr(html, lt + 5, gt, "hreflang")
              val href = findAttr(html, lt + 5, gt, "href")
              if (lang != null && lang.trim.nonEmpty && href != null)
                out += ((decodeEntities(lang).trim
                  .toLowerCase(java.util.Locale.ROOT), decodeEntities(href)))
            }
            i = gt + 1
          } else if (!inner.startsWith("/") && !inner.endsWith("/") &&
              RawTextTags.contains(name)) {
            val end = closeOf(html, gt + 1, name)
            i = if (end < 0) n else end
          } else i = gt + 1
        }
      }
    }
    out.result()
  }

  private def indexOfIgnoreCase(s: String, needle: String): Int = {
    val n = s.length - needle.length
    var i = 0
    while (i <= n) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** href value inside an attribute span [from, to) of `html`; null if none.
    * Handles `href="x"`, `href='x'`, bare `href=x`, any key case, spaces
    * around '='.
    */
  private def findHref(html: String, from: Int, to: Int): String =
    findAttr(html, from, to, "href")

  /** Value of attribute `key` inside span [from, to); null if absent.
    * Same states as the href parser it generalizes: quoted either way,
    * bare values, any key case, whitespace around '='.
    */
  private def findAttr(html: String, from: Int, to: Int, key: String): String = {
    val kl = key.length
    var k = from
    while (k + kl <= to) {
      val isKey = html.regionMatches(true, k, key, 0, kl) &&
        (k == from || Character.isWhitespace(html.charAt(k - 1)))
      if (isKey) {
        var i = k + kl
        while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
        if (i < to && html.charAt(i) == '=') {
          i += 1
          while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
          if (i >= to) return null
          val q = html.charAt(i)
          if (q == '"' || q == '\'') {
            val end = html.indexOf(q, i + 1)
            return if (end < 0 || end > to) null else html.substring(i + 1, end)
          } else {
            // unquoted value: runs to whitespace or tag end — '/' is NOT a
            // terminator (HTML5 unquoted-attribute state: <a href=/about>
            // means "/about", <a href=docs/p.html> keeps the full path)
            var j = i
            while (j < to && !Character.isWhitespace(html.charAt(j))) j += 1
            return html.substring(i, j)
          }
        }
      }
      k += 1
    }
    null
  }

  /** `preprocess_text` (`:95-99`): collapse [ \t]+ → " ", \n{2,} → "\n",
    * then Python-strip. Pure-Scala twin of the column pipeline in
    * [[graft.functions]] (which uses codegen'd regexp_replace built-ins).
    */
  // precompiled: String.replaceAll compiles its Pattern on EVERY call, and
  // preprocess runs once per page in the extraction hot path — identical
  // regex semantics, one compile per JVM instead of two per page
  private val SpacesTabs = java.util.regex.Pattern.compile("[ \t]+")
  private val MultiNewline = java.util.regex.Pattern.compile("\n{2,}")

  def preprocess(text: String): String = {
    if (text == null) return null
    val a = SpacesTabs.matcher(text).replaceAll(" ")
    val b = MultiNewline.matcher(a).replaceAll("\n")
    Py.strip(b)
  }

  /** Full per-row text pipeline: clean+extract then preprocess. This output
    * is the per-row invariant column (`BASELINE.json` input_hint:
    * "byte-identical extracted text per url").
    */
  def extractReadable(html: String): String =
    if (html == null) null else preprocess(extract(html))

  /** Title + heading outline of a page. */
  final case class Outline(title: String, h: Array[Int])

  /** First `<title>` content + `h1..h6` open-tag counts — the
    * document-structure signals soft-404 gates and boilerplate
    * classifiers key on (an error page titled "404 Not Found" sails
    * through text-quality checks; a page with 40 `<h3>`s and no body is
    * a link hub). Title is RCDATA per the HTML5 tokenizer: runs to the
    * literal `</title` close tag, NO tags parsed inside (a stray `<b>`
    * stays text), entities decoded, whitespace collapsed; first title
    * wins, absent/self-closing → "". Heading counts skip comments and
    * raw-text elements (an `<h1>` inside a script string is not
    * structure), matching the comment/raw-text blindness of
    * [[extractLinks]] and [[pageDirectives]].
    */
  def outline(html: String): Outline = {
    val h = new Array[Int](6)
    if (html == null) return Outline("", h)
    var title: String = null
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else {
        val gt = tagEnd(html, lt + 1)
        if (gt < 0) i = n
        else {
          val inner = html.substring(lt + 1, gt)
          val body = inner.stripPrefix("/").stripSuffix("/")
          val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
          val name = (if (sp < 0) body else body.substring(0, sp))
            .toLowerCase(java.util.Locale.ROOT)
          val isOpen = !inner.startsWith("/")
          if (isOpen && name == "title" && title == null) {
            if (inner.endsWith("/")) { title = ""; i = gt + 1 }
            else {
              // RCDATA: content ends at the literal close tag only
              var j = gt + 1
              var close = -1
              while (close < 0 && j < n) {
                val c = html.indexOf("</", j)
                if (c < 0) j = n
                else if (html.regionMatches(true, c + 2, "title", 0, 5)) close = c
                else j = c + 2
              }
              val raw = html.substring(gt + 1, if (close < 0) n else close)
              title = decodeEntities(raw).trim
                .split("\\s+").filter(_.nonEmpty).mkString(" ")
              i = if (close < 0) n else {
                val cgt = html.indexOf('>', close + 2)
                if (cgt < 0) n else cgt + 1
              }
            }
          } else if (isOpen && name.length == 2 && name.charAt(0) == 'h' &&
              name.charAt(1) >= '1' && name.charAt(1) <= '6') {
            h(name.charAt(1) - '1') += 1
            i = gt + 1
          } else if (isOpen && !inner.endsWith("/") && RawTextTags.contains(name)) {
            val end = closeOf(html, gt + 1, name)
            i = if (end < 0) n else end
          } else i = gt + 1
        }
      }
    }
    Outline(if (title == null) "" else title, h)
  }
}
