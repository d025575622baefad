package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextOps
import graft.pipeline.TextOps.RobotsRule

/** RFC 9309 matcher edge cases for [[TextOps.robotsMatch]] /
  * [[robotsAllowed]] / [[robotsGroup]] — in particular the anchored
  * wildcard case where the earliest occurrence of the final segment is
  * NOT at the path end (greedy-first on the last anchored segment
  * would wrongly reject), the tie-goes-to-allow rule, and the
  * exclusive group selection. */
class RobotsSpec extends AnyFunSuite {

  test("wildcard + anchor matching") {
    assert(TextOps.robotsMatch("/a", "/ab"))          // plain prefix
    assert(TextOps.robotsMatch("/a$", "/a"))
    assert(!TextOps.robotsMatch("/a$", "/ab"))        // anchor blocks
    assert(TextOps.robotsMatch("/tmp*", "/tmp123"))
    assert(TextOps.robotsMatch("/tmp*", "/tmp"))      // '*' matches empty
    assert(TextOps.robotsMatch("/a*b", "/axxb/c"))
    assert(!TextOps.robotsMatch("/a*b", "/axxc"))
    // the anchored-final-segment case: 'b' occurs mid-path too
    assert(TextOps.robotsMatch("/a*b$", "/axbyb"))
    assert(!TextOps.robotsMatch("/a*b$", "/axbyc"))
    assert(TextOps.robotsMatch("/x*y*z$", "/x1y2y3z"))
    assert(TextOps.robotsMatch("/p*$", "/p/anything")) // trailing *$
  }

  test("longest match wins; allow wins ties; no match allows") {
    val rules = Seq(RobotsRule(allow = false, "/private"),
                    RobotsRule(allow = true, "/private/ok"))
    assert(TextOps.robotsAllowed(rules, "/private/x") == ((false, 8)))
    assert(TextOps.robotsAllowed(rules, "/private/ok/x") == ((true, 11)))
    assert(TextOps.robotsAllowed(rules, "/pub") == ((true, 0)))
    // anchored pattern is LONGER by its '$' — allow wins on "/t/"
    // via length, and the anchor stops matching "/t/x"
    val tie = Seq(RobotsRule(allow = false, "/t/"),
                  RobotsRule(allow = true, "/t/$"))
    assert(TextOps.robotsAllowed(tie, "/t/") == ((true, 4)))
    assert(TextOps.robotsAllowed(tie, "/t/x") == ((false, 3)))
    assert(TextOps.robotsAllowed(
      Seq(RobotsRule(allow = false, "/x"), RobotsRule(allow = true, "/y")),
      "/z") == ((true, 0)))
    assert(TextOps.robotsAllowed(
      Seq(RobotsRule(allow = false, "/ab"), RobotsRule(allow = true, "/cd")),
      "/ab") == ((false, 3)))
    val t2 = Seq(RobotsRule(allow = false, "/aa"),
                 RobotsRule(allow = true, "/bb"))
    assert(TextOps.robotsAllowed(t2 :+ RobotsRule(allow = true, "/aa"),
      "/aa") == ((true, 3)), "length tie must go to allow")
  }

  test("group selection is exclusive and case-insensitive") {
    val txt = "User-agent: *\nDisallow: /star\n\n" +
      "User-agent: GraftBot\nUser-agent: other\nDisallow: /bot\n" +
      "# comment\nDisallow:\nSitemap: http://x/s.xml\n"
    val groups = TextOps.robotsParse(txt)
    val bot = TextOps.robotsGroup(groups, "graftbot")
    assert(bot == Seq(RobotsRule(allow = false, "/bot")))
    // the * rules must NOT merge in
    assert(TextOps.robotsAllowed(bot, "/star/x")._1)
    val other = TextOps.robotsGroup(groups, "OTHER")
    assert(other == bot)
    val unknown = TextOps.robotsGroup(groups, "nobody")
    assert(unknown == Seq(RobotsRule(allow = false, "/star")))
    assert(TextOps.robotsGroup(Seq.empty, "x").isEmpty)
    // RFC 9309: TWO groups naming the same token COMBINE (review fix —
    // collectFirst dropped the later group's rules)
    val twoGroups = TextOps.robotsParse(
      "User-agent: bot\nDisallow: /x\n\n" +
      "User-agent: other\nDisallow: /o\n\n" +
      "User-agent: bot\nDisallow: /y\n")
    val combined = TextOps.robotsGroup(twoGroups, "bot")
    assert(combined == Seq(RobotsRule(allow = false, "/x"),
                           RobotsRule(allow = false, "/y")))
    assert(!TextOps.robotsAllowed(combined, "/y/z")._1)
  }

  test("named group with zero rules claims the agent (allow-all)") {
    // the common allow-everything exemption: a named group whose only
    // line is an empty Disallow. RFC 9309 group matching is exclusive
    // on group EXISTENCE — '*' must NOT apply to the exempted crawler.
    val txt = "User-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nDisallow:\n"
    val groups = TextOps.robotsParse(txt)
    val bot = TextOps.robotsGroup(groups, "graftbot")
    assert(bot.isEmpty)
    assert(TextOps.robotsAllowed(bot, "/anything")._1)
    // everyone else still sees the '*' deny
    assert(!TextOps.robotsAllowed(
      TextOps.robotsGroup(groups, "nobody"), "/anything")._1)
  }

  test("percent-encoding canonical form (RFC 9309 §2.2.2)") {
    // %XX hex uppercases; unreserved octets decode to the literal
    assert(TextOps.pctCanonical("/a%2fb") == "/a%2Fb")
    assert(TextOps.pctCanonical("/%7Efoo") == "/~foo")
    assert(TextOps.pctCanonical("/%41%62c") == "/Abc")
    // raw non-ASCII percent-encodes from UTF-8 octets
    assert(TextOps.pctCanonical("/café") == "/caf%C3%A9")
    assert(TextOps.pctCanonical("/a b") == "/a%20b")
    // metacharacters and reserved chars stay raw; %2F stays encoded
    // (distinct from a path '/')
    assert(TextOps.pctCanonical("/t*mp$?q=1") == "/t*mp$?q=1")
    // a stray '%' not followed by two hex digits re-encodes as %25 —
    // applied identically to pattern and path, so they still match
    assert(TextOps.pctCanonical("/100%") == "/100%25")
    assert(TextOps.pctCanonical("/100%zz") == "/100%25zz")
    // end-to-end: an encoded rule matches the decoded path and vice
    // versa for unreserved octets...
    val g = TextOps.robotsParse(
      "User-agent: *\nDisallow: /caf%C3%A9\nDisallow: /%7Euser\n")
    val rules = TextOps.robotsGroup(g, "anybot")
    assert(!TextOps.robotsAllowed(rules, "/café/menu")._1)
    assert(!TextOps.robotsAllowed(rules, "/~user/x")._1)
    assert(!TextOps.robotsAllowed(rules, "/%7euser/x")._1)
    // ...but %2F does NOT collapse into the path delimiter
    val g2 = TextOps.robotsParse("User-agent: *\nDisallow: /a%2Fb\n")
    val r2 = TextOps.robotsGroup(g2, "anybot")
    assert(TextOps.robotsAllowed(r2, "/a/b")._1)
    assert(!TextOps.robotsAllowed(r2, "/a%2fb")._1)
  }
}
