package graft

import org.scalatest.funsuite.AnyFunSuite

/** The typed mapPartitions decode pipeline must agree with the SQL-surface
  * stub (same arithmetic, two execution paths). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed decodeStub equals SQL-surface mm_decode_stub") {
    val binDf = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val typed = llm.Multimodal.decodeStub(spark, binDf)
      .toDF().orderBy("doc_id").collect()
    val sql = llm.Multimodal.decodeStubQuery.run(spark, TestSpark.Sf).collect()
    assert(typed.length === sql.length)
    typed.zip(sql).foreach { case (t, s) =>
      assert(t.getLong(0) === s.getLong(0))
      assert(t.getInt(1) === s.getInt(1), s"width for doc ${t.getLong(0)}")
      assert(t.getInt(2) === s.getInt(2), s"height for doc ${t.getLong(0)}")
      assert(t.getInt(3) === s.getInt(3), s"n_frames for doc ${t.getLong(0)}")
      assert(t.getString(4) === s.getString(4), s"codec for doc ${t.getLong(0)}")
    }
  }

  test("decode stub is deterministic per payload") {
    val m1 = llm.Multimodal.decodeStubRecord(1L, "hello world".getBytes)
    val m2 = llm.Multimodal.decodeStubRecord(1L, "hello world".getBytes)
    assert(m1 === m2)
  }

  test("phash dedup: groups are byte-length classes, keeper is min id, singletons dropped") {
    import org.apache.spark.sql.functions._
    val out = llm.Multimodal.phashDedup.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // the stub signature is a pure function of payload byte length, so the
    // collision groups must be exactly the byte-length classes of size >= 2
    val lens = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", octet_length($"text".cast("binary")).as("b")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    def sig(b: Long): Long =
      (((64 + b % 577) * 512 + (64 + (b * 7) % 417)) * 32 + (1 + b % 16)) * 4 + b % 3
    val expected = lens.groupBy(r => sig(r._2.toLong)).collect {
      case (p, rs) if rs.length >= 2 =>
        (p, rs.map(_._1).min, rs.length.toLong, rs.map(_._1).max)
    }.toSet
    val got = out.map(r => (r.getAs[Long]("phash"), r.getAs[Long]("keeper"),
      r.getAs[Long]("n_copies"), r.getAs[Long]("max_dup"))).toSet
    assert(got === expected, "collision groups must be exactly byte-length classes")
    // coarseness is the point: at least one group collapses DISTINCT payloads
    val byLen = lens.groupBy(_._2).filter(_._2.length >= 2)
    assert(byLen.nonEmpty, "fixture must contain equal-length distinct payloads")
  }

  test("scene cut: scenes tile the frame range and match a driver recomputation") {
    import org.apache.spark.sql.functions._
    val out = llm.Multimodal.sceneCut.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(out.nonEmpty)
    val lens = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", octet_length($"text".cast("binary")).as("b")).collect()
      .map(r => (r.getLong(0), 8 + r.getInt(1) % 24))
    val expected = lens.flatMap { case (doc, nf) =>
      val feats = (0 until nf).map(i => (doc * 37 + i.toLong * i * 13) % 256)
      val cuts = (0 until nf).map(i =>
        i > 0 && math.abs(feats(i) - feats(i - 1)) > 128)
      val sceneIds = cuts.scanLeft(0L)((acc, c) => if (c) acc + 1 else acc).drop(1)
      (0 until nf).groupBy(sceneIds).map { case (sid, frames) =>
        (doc, sid, frames.min, frames.max, frames.size.toLong)
      }
    }.toSet
    assert(out.toSet === expected.map {
      case (d, s, lo, hi, n) => (d, s, lo, hi, n) })
    // tiling: per doc, scenes are contiguous and cover [0, n_frames)
    out.groupBy(_._1).foreach { case (doc, scenes) =>
      val sorted = scenes.sortBy(_._3)
      assert(sorted.head._3 == 0, s"doc $doc: first scene must start at frame 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4 + 1,
          s"doc $doc: gap between scenes at frame ${a._4}")
        case _ =>
      }
    }
    // the threshold must actually cut somewhere on the fixture
    assert(out.exists(_._2 > 0), "no document ever produced a second scene")
  }

  test("shard pack: brute prefix-sum cut reproduced; shards are contiguous id ranges") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = docs.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, b)) =>
      (id, cum / 4096L, cum + b)
    }.tail.map { case (id, shard, _) => id -> shard }.toMap
    val out = llm.Multimodal.shardPack.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    var prevMax = -1L
    out.foreach { r =>
      val (first, last) = (r.getAs[Long]("first_doc"), r.getAs[Long]("max_doc"))
      assert(first > prevMax, "shards must be contiguous, disjoint id ranges")
      prevMax = last
      assert(brute(first) === r.getAs[Long]("shard_id"), s"doc $first shard")
      assert(brute(last) === r.getAs[Long]("shard_id"), s"doc $last shard")
      assert(r.getAs[Long]("bytes") ===
        docs.filter(d => d._1 >= first && d._1 <= last).map(_._2).sum)
    }
  }

  test("mm_patchify: grid arithmetic exact per doc — counts, edge clips, XOR checksum replay") {
    val out = llm.Multimodal.patchify.run(spark, TestSpark.Sf).collect()
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8").length))
    assert(out.length === docs.length)
    val byId = docs.toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val b = byId(id)
      val w = 64 + b % 577; val h = 64 + (b * 7) % 417
      val npx = (w + 15) / 16; val npy = (h + 15) / 16
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Int]("n_px") === npx)
      assert(r.getAs[Int]("n_py") === npy)
      assert(r.getAs[Long]("n_patches") === (npx.toLong * npy))
      // edge patches: last column iff w % 16 != 0, last row iff h % 16 != 0
      val edge = npx.toLong * npy -
        (if (w % 16 == 0) npx.toLong else npx - 1L) *
          (if (h % 16 == 0) npy.toLong else npy - 1L)
      assert(r.getAs[Long]("n_edge_patches") === edge, s"doc $id edge count")
      var x = 0L
      for (px <- 0 until npx; py <- 0 until npy)
        x ^= java.lang.Math.floorMod(id * 131 + px * 17 + py, 9973L)
      assert(r.getAs[Long]("tag_checksum") === x, s"doc $id checksum")
    }
  }
}
