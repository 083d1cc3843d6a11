package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge-application semantics: leftmost-greedy runs, symbol-boundary
  * safety, and fit bookkeeping.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def seqsOf(rows: (String, Long, String)*) =
    rows.toDF("word", "cnt", "seq")

  private def merged(df: org.apache.spark.sql.DataFrame, p1: String, p2: String) =
    Bpe.applyMerge(df, p1, p2).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap

  test("self-overlapping runs merge at even offsets only (leftmost-greedy)") {
    val m = merged(seqsOf(
      ("lll", 1L, "l l l"), ("llll", 1L, "l l l l"), ("lllll", 1L, "l l l l l")),
      "l", "l")
    assert(m("lll") === "ll l")
    assert(m("llll") === "ll ll")
    assert(m("lllll") === "ll ll l")
  }

  test("merge never crosses symbol boundaries") {
    // 'ka b': substring "a b" appears in the joined text but 'ka' != 'a'
    val m = merged(seqsOf(("kab", 1L, "ka b"), ("ab", 1L, "a b")), "a", "b")
    assert(m("kab") === "ka b")
    assert(m("ab") === "ab")
  }

  test("non-adjacent repeats all merge") {
    val m = merged(seqsOf(("abab", 1L, "a b a b")), "a", "b")
    assert(m("abab") === "ab ab")
  }

  test("fit stops early when no pairs remain; caller's persist is untouched") {
    val words = Seq(("a", 5L), ("b", 3L))
      .toDF("word", "cnt").withColumn("seq", Bpe.charSeq(col("word")))
      .persist()
    try {
      val out = Bpe.fit(words, 4)
      assert(out === Seq((0, "<base>", 0L, 8L))) // nothing mergeable
      assert(words.storageLevel !==
        org.apache.spark.storage.StorageLevel.NONE)
    } finally words.unpersist(blocking = false)
  }

  test("fit: totals decrease by the number of merged occurrences") {
    val words = Seq(("banana", 3L), ("bandana", 2L))
      .toDF("word", "cnt").withColumn("seq", Bpe.charSeq(col("word")))
    val out = Bpe.fit(words, 2)
    assert(out.length === 3)
    val base = out.head._4
    // 'a n' occurs 2x in banana, 2x in bandana (weighted 3*2 + 2*2 = 10),
    // non-overlapping -> all merge
    assert(out(1)._2 === "a n" && out(1)._3 === 10L)
    assert(out(1)._4 === base - 10L)
    // totals strictly decrease each round
    assert(out(2)._4 < out(1)._4)
  }
}
