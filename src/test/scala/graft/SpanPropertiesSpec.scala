package graft

import graft.operators.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-corpus laws for the span operators, checked against local
  * first-principles recomputation (deterministic seeds — repeatable). */
class SpanPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Random corpus with deliberately shared token runs and paragraphs. */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    val sharedRuns = (0 until 4).map(r =>
      (0 until 10).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val sharedParas = (0 until 3).map(pp =>
      (0 until 6).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    (0L until nDocs.toLong).map { id =>
      val paras = (0 to rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean()) sharedParas(rnd.nextInt(sharedParas.size))
        else if (rnd.nextInt(3) == 0)
          sharedRuns(rnd.nextInt(sharedRuns.size)) + " " + vocab(rnd.nextInt(vocab.size))
        else (0 until 3 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      (id, paras.mkString("\n\n"))
    }
  }

  private def w8(text: String): Set[String] = {
    val ts = text.split("\\s+").filter(_.nonEmpty).toSeq
    if (ts.length < 8) Set(ts.mkString(" "))
    else ts.sliding(8).map(_.mkString(" ")).toSet
  }

  test("substringDupPairs equals local brute force on random corpora (incl. df cutoff)") {
    for (seed <- 1 to 4) {
      val docs = corpus(seed, 30)
      for (maxDf <- Seq(4, 256)) {
        val wins = docs.map { case (id, t) => id -> w8(t) }
        val dfCount = wins.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
        val kept = wins.map { case (id, ws) => id -> ws.filter(w => dfCount(w) <= maxDf) }
        val expected = (for {
          (ia, wa) <- kept; (ib, wb) <- kept if ia < ib
          n = (wa & wb).size if n >= 1
        } yield (ia, ib, n.toLong)).toSet
        val got = Dedup.substringDupPairs(docs.toDF("doc_id", "text"),
            "doc_id", "text", maxDf = maxDf)
          .as[(Long, Long, Long)].collect().toSet
        assert(got == expected,
          s"seed=$seed maxDf=$maxDf missing=${expected -- got} extra=${got -- expected}")
      }
    }
  }

  test("spanDedup laws: first-occurrence keep, order preserved, counts add up") {
    for (seed <- 10 to 12) {
      val docs = corpus(seed, 30)
      val spansOf = docs.map { case (id, t) =>
        id -> t.split("\\n{2,}").map(_.trim).filter(_.nonEmpty).toSeq
      }.toMap
      // local first occurrence: min (doc, pos) per distinct span
      val firstOf = spansOf.toSeq
        .flatMap { case (id, ss) => ss.zipWithIndex.map { case (s, p) => (s, (id, p)) } }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got.keySet == docs.map(_._1).toSet, "every doc must come back")
      for ((id, (text, nKept, nDropped)) <- got) {
        val outSpans = text.split("\\n{2,}").map(_.trim).filter(_.nonEmpty).toSeq
        val inSpans = spansOf(id)
        // exactly the spans whose first occurrence is (this doc, that pos),
        // in original order
        val expectedKept = inSpans.zipWithIndex
          .filter { case (s, p) => firstOf(s) == ((id, p)) }.map(_._1)
        assert(outSpans == expectedKept, s"seed=$seed doc $id spans differ")
        assert(nKept == expectedKept.size && nKept + nDropped == inSpans.size,
          s"seed=$seed doc $id counts")
      }
      // corpus-wide: every distinct input span appears exactly once
      val allOut = got.values.toSeq.flatMap(_._1.split("\\n{2,}"))
        .map(_.trim).filter(_.nonEmpty)
      assert(allOut.size == allOut.distinct.size, "duplicate span survived")
      assert(allOut.toSet == spansOf.values.flatten.toSet, "span lost or invented")
    }
  }

  test("chunkTokens laws: full coverage, stride offsets, exact reconstruction") {
    for (seed <- 1 to 4; (size, stride) <- Seq((8, 8), (8, 5), (16, 4))) {
      val docs = corpus(seed, 25)
      val toksOf = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val got = graft.operators.TextAnalysis
        .chunkTokens(docs.toDF("doc_id", "text"), "doc_id", "text", size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
      assert(got.keySet == toksOf.filter(_._2.nonEmpty).keySet,
        s"seed=$seed: docs with tokens must chunk, empty docs must not")
      for ((id, chunks) <- got) {
        val ts = toksOf(id)
        // starts are exactly 0, stride, ... < n and idx enumerates them
        assert(chunks.map(_._3) == chunks.indices.map(i => i.toLong * stride),
          s"seed=$seed doc $id starts")
        assert(chunks.map(_._2) == chunks.indices.map(_.toLong), s"doc $id idx")
        for ((_, _, start, len, text) <- chunks) {
          val expect = ts.slice(start.toInt, start.toInt + size)
          assert(text == expect.mkString(" ") && len == expect.size,
            s"seed=$seed doc $id chunk@$start")
        }
        // every token position is covered by at least one chunk
        val covered = chunks.flatMap(c => c._3 until c._3 + c._4).toSet
        assert(covered == (0L until ts.size.toLong).toSet, s"doc $id coverage gap")
      }
    }
  }
}
