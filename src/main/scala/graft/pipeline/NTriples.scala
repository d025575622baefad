package graft.pipeline

/** REAL N-Triples parser (W3C RDF 1.1 N-Triples, public spec) — the
  * standard knowledge-graph interchange format next to the reference's
  * integer-TSV triples: one triple per line, `<IRI>` terms, `_:label`
  * blank nodes, `"literal"` objects with optional `@lang` tag or
  * `^^<datatype>` suffix, string escapes (\t \n \r \" \\ \uXXXX
  * \UXXXXXXXX), `#` comment lines, flexible whitespace, and the
  * terminating `.`. Malformed lines are reported with an error class
  * (never silently skipped or half-parsed) so corpus hygiene is
  * measurable — the refuse-rather-than-guess policy at line scope. */
object NTriples {

  /** kind: iri | blank | literal. lang carries `@lang` or the datatype
    * IRI prefixed "^^" (one field — they are mutually exclusive). */
  final case class Term(kind: String, value: String, lang: String)

  final case class Triple(subject: Term, predicate: Term, obj: Term)

  private final class P(val s: String) {
    var i = 0
    def ws(): Unit =
      while (i < s.length && (s(i) == ' ' || s(i) == '\t')) i += 1
    def eof: Boolean = i >= s.length
  }

  private def unescape(raw: String): Either[String, String] = {
    val out = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw(i)
      if (c == '\\') {
        if (i + 1 >= raw.length) return Left("bad-escape")
        raw(i + 1) match {
          case 't' => out += '\t'; i += 2
          case 'n' => out += '\n'; i += 2
          case 'r' => out += '\r'; i += 2
          case '"' => out += '"'; i += 2
          case '\\' => out += '\\'; i += 2
          case 'u' =>
            if (i + 6 > raw.length) return Left("bad-escape")
            val h = raw.substring(i + 2, i + 6)
            try { out += Integer.parseInt(h, 16).toChar; i += 6 }
            catch { case _: NumberFormatException => return Left("bad-escape") }
          case 'U' =>
            if (i + 10 > raw.length) return Left("bad-escape")
            val h = raw.substring(i + 2, i + 10)
            try {
              out ++= new String(Character.toChars(Integer.parseInt(h, 16)))
              i += 10
            } catch { case _: Exception => return Left("bad-escape") }
          case _ => return Left("bad-escape")
        }
      } else { out += c; i += 1 }
    }
    Right(out.toString)
  }

  private def parseIri(p: P): Either[String, String] = {
    if (p.eof || p.s(p.i) != '<') return Left("expected-iri")
    val end = p.s.indexOf('>', p.i + 1)
    if (end < 0) return Left("unterminated-iri")
    val iri = p.s.substring(p.i + 1, end)
    if (iri.exists(c => c == ' ' || c == '<' || c == '"'))
      return Left("bad-iri-char")
    p.i = end + 1
    Right(iri)
  }

  private def parseTerm(p: P, allowLiteral: Boolean,
                        allowBlank: Boolean): Either[String, Term] = {
    p.ws()
    if (p.eof) return Left("truncated")
    p.s(p.i) match {
      case '<' => parseIri(p).map(Term("iri", _, ""))
      case '_' if allowBlank =>
        if (p.i + 1 >= p.s.length || p.s(p.i + 1) != ':')
          return Left("bad-blank")
        var j = p.i + 2
        while (j < p.s.length && !p.s(j).isWhitespace && p.s(j) != '.') j += 1
        if (j == p.i + 2) return Left("bad-blank")
        val label = p.s.substring(p.i + 2, j)
        p.i = j
        Right(Term("blank", label, ""))
      case '"' if allowLiteral =>
        // scan to the closing unescaped quote
        var j = p.i + 1
        var closed = -1
        while (j < p.s.length && closed < 0) {
          if (p.s(j) == '\\') j += 2
          else if (p.s(j) == '"') closed = j
          else j += 1
        }
        if (closed < 0) return Left("unterminated-literal")
        val rawBody = p.s.substring(p.i + 1, closed)
        p.i = closed + 1
        unescape(rawBody).flatMap { body =>
          if (p.i < p.s.length && p.s(p.i) == '@') {
            var k = p.i + 1
            while (k < p.s.length && (p.s(k).isLetterOrDigit || p.s(k) == '-'))
              k += 1
            if (k == p.i + 1) Left("bad-langtag")
            else {
              val lang = p.s.substring(p.i + 1, k)
              p.i = k
              Right(Term("literal", body, "@" + lang))
            }
          } else if (p.i + 1 < p.s.length && p.s(p.i) == '^' &&
                     p.s(p.i + 1) == '^') {
            p.i += 2
            parseIri(p).map(dt => Term("literal", body, "^^" + dt))
          } else Right(Term("literal", body, ""))
        }
      case _ => Left("bad-term")
    }
  }

  /** Parse one line: Right(None) for blank/comment lines, Right(Some)
    * for a triple, Left(errorClass) for malformed input. */
  def parseLine(line: String): Either[String, Option[Triple]] = {
    val p = new P(line)
    p.ws()
    if (p.eof || p.s(p.i) == '#') return Right(None)
    for {
      s <- parseTerm(p, allowLiteral = false, allowBlank = true)
      pr <- parseTerm(p, allowLiteral = false, allowBlank = false)
      o <- parseTerm(p, allowLiteral = true, allowBlank = true)
      _ <- {
        p.ws()
        if (p.eof || p.s(p.i) != '.') Left("missing-dot")
        else {
          p.i += 1
          p.ws()
          if (!p.eof) Left("trailing-garbage") else Right(())
        }
      }
    } yield Some(Triple(s, pr, o))
  }
}
