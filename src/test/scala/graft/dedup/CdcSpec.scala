package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private def chunksOf(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, String)]] =
    Dedup.cdcChunks(spark, docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  private val fixture = Seq(
    0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5,
    1L -> "one two three four five six seven eight nine ten eleven twelve",
    2L -> "x").map { case (id, t) => (id, t.trim) }

  test("chunks partition the token stream (coverage, no overlap)") {
    chunksOf(fixture).foreach { case (id, chs) =>
      val text = fixture.find(_._1 == id).get._2
      // indices contiguous from 0
      assert(chs.map(_._1) === (0L until chs.size.toLong))
      // token counts add up
      assert(chs.map(_._2).sum === text.split(" ", -1).length.toLong)
    }
  }

  test("boundary rule: a chunk closes exactly at boundary words") {
    chunksOf(fixture).foreach { case (id, chs) =>
      val words = fixture.find(_._1 == id).get._2.split(" ", -1)
      var pos = 0
      chs.zipWithIndex.foreach { case ((_, n, _), ci) =>
        val chunkWords = words.slice(pos, pos + n.toInt)
        // every non-final word of a chunk is NOT a boundary
        chunkWords.dropRight(1).foreach(w =>
          assert(Dedup.wordHash(w) % Dedup.CdcDivisor != 0L, s"doc $id word $w"))
        // the final word IS a boundary unless this is the doc's last chunk
        if (ci < chs.size - 1)
          assert(Dedup.wordHash(chunkWords.last) % Dedup.CdcDivisor === 0L)
        pos += n.toInt
      }
    }
  }

  test("chunk hash is the md5 of the space-joined chunk text") {
    val doc = fixture.head
    val words = doc._2.split(" ", -1)
    var pos = 0
    chunksOf(Seq(doc))(doc._1).foreach { case (_, n, hex) =>
      val txt = words.slice(pos, pos + n.toInt).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = md.digest(txt.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(hex === want)
      pos += n.toInt
    }
  }

  test("edit locality: a single replaced word loses at most one chunk") {
    val base = (0 until 200).map(i => s"w${i * 37 % 211}x$i").mkString(" ")
    val edited = {
      val ws = base.split(" ", -1); ws(100) = "REPLACED"; ws.mkString(" ")
    }
    val ch = chunksOf(Seq(10L -> base, 11L -> edited))
    val a = ch(10L).map(_._3).toSet
    val b = ch(11L).map(_._3).toSet
    // the replacement either stays inside one chunk (1 differing chunk)
    // or toggles a boundary (2 adjacent chunks merge/split)
    assert((a -- b).size <= 2, s"lost ${(a -- b).size} chunks")
    assert((a & b).size >= a.size - 2)
  }

  test("cdcSharedPairs finds exact and perturbed copies") {
    val corpus = Dedup.corpusWithCopies(spark, sf1)
    val pairs = Dedup.cdcSharedPairs(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docIds = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long].collect()
    // every exact copy (id % 7 == 0 with enough chunks) pairs with its
    // source, sharing ALL of the source's distinct non-hot chunks
    val exactSources = docIds.filter(_ % 7 == 0)
    val found = exactSources.count(id => pairs.contains((id, id + 200000L)))
    assert(found >= exactSources.length * 9 / 10,
      s"only $found/${exactSources.length} exact copies found")
    // perturbed near-copies (id % 5 == 0) still share untouched chunks
    val nearSources = docIds.filter(_ % 5 == 0)
    val foundNear = nearSources.count(id => pairs.contains((id, id + 100000L)))
    assert(foundNear >= nearSources.length / 2,
      s"only $foundNear/${nearSources.length} near copies found")
  }
}
