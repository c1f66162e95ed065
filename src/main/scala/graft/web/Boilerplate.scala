package graft.web

import graft.html.MiniHtml

/** Boilerplate removal — the HTML → clean-text step every web-corpus
  * pipeline runs between the crawl and the language filters (the
  * CCNet / RefinedWeb extraction tier). Two real rules over the parsed
  * DOM ([[graft.html.MiniHtml]]):
  *
  *  1. chrome elements dropped by TAG wherever they sit:
  *     nav/footer/aside/header/script/style;
  *  2. among the remaining top-level blocks under `<body>`, any block
  *     whose LINK DENSITY (text characters inside `<a>` descendants ÷
  *     total text characters) exceeds 0.5 is dropped — the classic
  *     menu/related-links heuristic. This rule is load-bearing: a
  *     link-farm `<div>` carries no chrome tag and survives rule 1.
  *
  * Surviving block texts join with a single `\n`. A block with no text
  * has density 0 (kept) — empty paragraphs are content, not chrome.
  */
object Boilerplate {

  private val ChromeTags =
    Set("nav", "footer", "aside", "header", "script", "style")

  /** Total text characters under `e`, and the subset inside `<a>`
    * subtrees (one pass, link-flagged).
    */
  private def charCounts(e: MiniHtml.Elem): (Long, Long) = {
    var total = 0L
    var linked = 0L
    def walk(n: MiniHtml.Node, inLink: Boolean): Unit = n match {
      case t: MiniHtml.TextNode =>
        total += t.value.length
        if (inLink) linked += t.value.length
      case el: MiniHtml.Elem =>
        if (!ChromeTags.contains(el.tag))
          el.children.foreach(walk(_, inLink || el.tag == "a"))
      case _ => ()
    }
    e.children.foreach(walk(_, e.tag == "a"))
    (total, linked)
  }

  /** Text of `e` with chrome subtrees excluded. */
  private def cleanText(e: MiniHtml.Elem): String = {
    val sb = new StringBuilder
    def walk(n: MiniHtml.Node): Unit = n match {
      case t: MiniHtml.TextNode => sb.append(t.value)
      case el: MiniHtml.Elem =>
        if (!ChromeTags.contains(el.tag)) el.children.foreach(walk)
      case _ => ()
    }
    walk(e)
    sb.toString
  }

  /** The extraction readout: surviving main text (blocks joined with
    * `\n`), block keep/drop counts (density drops only — chrome is
    * not counted, it was never a candidate).
    */
  final case class Extracted(mainText: String, kept: Int, droppedDense: Int)

  def extractMain(html: String): Extracted = {
    val root = MiniHtml.parse(html)
    val body = root.firstTag("body").getOrElse(root)
    var kept = 0
    var dropped = 0
    val blocks = Vector.newBuilder[String]
    body.children.foreach {
      case el: MiniHtml.Elem if !ChromeTags.contains(el.tag) =>
        val (total, linked) = charCounts(el)
        if (total > 0 && linked * 2 > total) dropped += 1
        else { kept += 1; blocks += cleanText(el) }
      case _ => () // bare text / chrome directly under body: not a block
    }
    Extracted(blocks.result().mkString("\n"), kept, dropped)
  }
}
