package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ParallelCoord

/** Parallel-coordinates search rendering: deterministic SVG geometry. */
class ParallelCoordSpec extends AnyFunSuite {

  private val trials: Seq[(Map[String, Any], Double)] = Seq(
    (Map[String, Any]("lr" -> 0.001, "enc" -> "minhash"), 0.70),
    (Map[String, Any]("lr" -> 0.01, "enc" -> "gap"), 0.80),
    (Map[String, Any]("lr" -> 0.1, "enc" -> "string"), 0.95),
    (Map[String, Any]("lr" -> 1.0), 0.60)) // enc absent -> Null tick

  test("one axis per param + score, one polyline per trial") {
    val svg = ParallelCoord.svgTrials(trials)
    assert(svg.count(_ == '\n') > 0)
    assert("<polyline".r.findAllIn(svg).length === trials.length)
    Seq("enc", "lr", "score").foreach(a =>
      assert(svg.contains(s""">$a</text>"""), s"missing axis label $a"))
    // categorical ticks incl. the Null pin for the absent param
    Seq("minhash", "gap", "string", "Null").foreach(c =>
      assert(svg.contains(s">$c</text>"), s"missing tick $c"))
    // numeric min/max ticks for lr and score
    assert(svg.contains(">0.001000</text>") || svg.contains(">0.001</text>"))
    assert(svg.contains(">1</text>"))
  }

  test("best trial is red, worst is blue") {
    val svg = ParallelCoord.svgTrials(trials)
    assert(svg.contains("rgb(255,0,0)"), "best trial not full red")
    assert(svg.contains("rgb(0,0,255)"), "worst trial not full blue")
  }

  test("log scaling moves midpoints: 0.01 sits halfway between 0.001 and 0.1") {
    def yOfLr(svg: String, trialIdx: Int): Double = {
      val line = "<polyline[^/]*/>".r.findAllIn(svg).toSeq(trialIdx)
      val pts = "points=\"([^\"]*)\"".r.findFirstMatchIn(line).get.group(1)
      pts.split(" ")(1).split(",")(1).toDouble // lr is the 2nd sorted axis? enc, lr, score
    }
    val three = trials.take(3)
    val lin = ParallelCoord.svgTrials(three)
    val log = ParallelCoord.svgTrials(three, logScale = Set("lr"))
    val (l0, l1, l2) = (yOfLr(log, 0), yOfLr(log, 1), yOfLr(log, 2))
    assert(math.abs(l1 - (l0 + l2) / 2) < 1.0,
      s"log axis midpoint off: $l0 $l1 $l2")
    val (a0, a1, a2) = (yOfLr(lin, 0), yOfLr(lin, 1), yOfLr(lin, 2))
    assert(math.abs(a1 - (a0 + a2) / 2) > 10.0,
      s"linear axis should NOT be midway: $a0 $a1 $a2")
  }

  test("html wrapper is self-contained and escapes the title") {
    val html = ParallelCoord.html(
      trials.map { case (p, s) =>
        graft.plans.Choices.SearchResult(p, s, null) },
      title = "t<est>")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("t&lt;est&gt;"))
    assert(html.contains("<svg "))
  }
}
