package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextOps

/** Round-16 hardening of the crawl-front parsers against real-world
  * input shapes the round-15 fixtures didn't exercise: sitemap tags
  * carrying attributes or namespace prefixes, and HTML documents whose
  * lowercase mapping changes string length (U+0130 'İ' → two chars)
  * before a `<script>`/`<style>` block. */
class CrawlFrontSpec extends AnyFunSuite {

  test("sitemap tags with attributes and namespace prefixes") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url changefreq="daily"><loc>http://a.org/1</loc>
        |  <lastmod>2026-01-01</lastmod></url>
        |<url><loc   >http://a.org/2?x=1&amp;y=2</loc>
        |  <priority>0.8</priority></url>
        |</urlset>""".stripMargin
    val es = TextOps.sitemapEntries(xml)
    assert(es == Seq(
      ("urlset", "http://a.org/1", "2026-01-01", -1.0),
      ("urlset", "http://a.org/2?x=1&y=2", "", 0.8)))

    val nsXml =
      """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:sitemap><sm:loc>http://a.org/s0.xml</sm:loc></sm:sitemap>
        |<sm:sitemap><sm:loc>http://a.org/s1.xml</sm:loc></sm:sitemap>
        |</sm:sitemapindex>""".stripMargin
    assert(TextOps.sitemapEntries(nsXml) == Seq(
      ("index", "http://a.org/s0.xml", "", -1.0),
      ("index", "http://a.org/s1.xml", "", -1.0)))
  }

  test("sitemap self-closing and malformed tags never throw") {
    // self-closing entry and self-closing optional fields skip cleanly
    val xml = "<urlset><url/><url><loc>http://a.org/x</loc>" +
      "<lastmod/><priority/></url></urlset>"
    assert(TextOps.sitemapEntries(xml) ==
      Seq(("urlset", "http://a.org/x", "", -1.0)))
    // unterminated open tag stops, does not loop or throw
    assert(TextOps.sitemapEntries("<urlset><url") == Seq.empty)
    assert(TextOps.sitemapEntries("<urlset><url foo") == Seq.empty)
    // a <urlbase> tag must not be mistaken for <url>
    assert(TextOps.sitemapEntries(
      "<urlset><urlbase><loc>http://x</loc></urlbase></urlset>") ==
      Seq.empty)
  }

  test("htmlExtract survives length-changing case mappings") {
    // 'İ' (U+0130) lowercases to two chars under Locale.ROOT; a
    // document containing it BEFORE a <script> block used to misalign
    // the close-tag index computed on the lowercased copy
    val html = "<p>İstanbul paragraph with enough text here ok</p>" +
      "<SCRIPT>var x = 1;</SCRIPT><p>second block also long enough " +
      "to keep around</p>"
    val (_, blocks) = TextOps.htmlExtract(html)
    assert(blocks.map(_._1) == Seq(
      "İstanbul paragraph with enough text here ok",
      "second block also long enough to keep around"))
    // and the script payload never leaks into any block
    assert(!blocks.exists(_._1.contains("var x")))
    // mixed-case close tag still terminates the skip
    val html2 = "<style>p{}</Style><p>after the style block we keep " +
      "this text</p>"
    val (_, b2) = TextOps.htmlExtract(html2)
    assert(b2.map(_._1) ==
      Seq("after the style block we keep this text"))
    assert(!b2.exists(_._1.contains("p{}")))
  }
}
