package graft

import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.streaming.EventStreams

class EngineIntegrationSpec extends SparkSuite {

  test("entry flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key exists in queries; names are stable") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("Sources.latestDatePartition picks max yyyyMMdd dir") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap").toFile
    Seq("20240101", "20240301", "20231231", "not_a_date").foreach { d =>
      new java.io.File(tmp, d).mkdirs()
    }
    val got = Sources.latestDatePartition(spark, tmp.getAbsolutePath)
    assert(got.exists(_.endsWith("20240301")))
    assert(Sources.latestDatePartition(spark, tmp.getAbsolutePath + "/missing").isEmpty)
  }

  test("Sources csv pipe + inferred round-trip via Sinks") {
    import spark.implicits._
    val df = Seq((1, "x|y"), (2, "plain")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    graft.io.Sinks.csv(df.select(col("id"), regexp_replace(col("s"), "\\|", "_").as("s")),
      dir + "/out", singleFile = true)
    val back = Sources.csvInferred(spark, dir + "/out")
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "integer")
  }

  test("Sinks json round-trip (K3), including the singleFile option") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.25), (3L, null.asInstanceOf[String], -2.0))
      .toDF("id", "s", "score")
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    // multi-part write -> read back: same rows, JSON line-record semantics
    // (null field omitted from the record, restored as null on read)
    graft.io.Sinks.json(df, dir + "/multi")
    val back = Sources.json(spark, dir + "/multi")
    assert(back.count() == 3)
    assert(back.select("id", "s", "score").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "a", 0.5), (2L, "b", 1.25), (3L, null, -2.0)))
    // singleFile = coalesce(1): exactly one part file, same content
    graft.io.Sinks.json(df, dir + "/single", singleFile = true)
    val parts = new java.io.File(dir + "/single").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    assert(parts.length == 1, s"expected one part file, got ${parts.length}")
    assert(Sources.json(spark, dir + "/single").count() == 3)
  }

  test("Sources orc round-trip, text lines, binaryFile ingestion") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    // orc: write via Sinks, read via Sources, schema + rows preserved
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    graft.io.Sinks.orc(df, dir + "/orc")
    val orcBack = Sources.orc(spark, dir + "/orc")
    assert(orcBack.count() == 2 && orcBack.schema("id").dataType.typeName == "long")
    // text: one row per line
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "corpus.txt"),
      "line one\nline two\nline three".getBytes)
    assert(Sources.text(spark, dir + "/corpus.txt").count() == 3)
    // binaryFile: content + length surface as columns; glob filters
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "img.bin"),
      Array[Byte](1, 2, 3, 4))
    val bin = Sources.binaryFiles(spark, dir, Some("*.bin"))
    val row = bin.select("length", "content").head
    assert(row.getLong(0) == 4L && row.getAs[Array[Byte]](1).length == 4)
  }

  test("stream-static enrichment matches the batch join") {
    import spark.implicits._
    val streamed = EventStreams.streamStaticEnrich(spark, sf)
      .select("event_id", "segment").as[(Long, String)].collect().toSet
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .select((col("c_custkey") % 150).as("user_id"), col("c_mktsegment"))
      .groupBy("user_id").agg(min(col("c_mktsegment")).as("segment"))
    val batch = graft.queries.T(spark, sf, "events")
      .select(col("event_id"), col("user_id"))
      .join(dim, Seq("user_id"), "left")
      .select("event_id", "segment").as[(Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("csv malformed rows: PERMISSIVE nulls + captures, DROPMALFORMED drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bad").toString
    // row 2 is structurally malformed (MORE tokens than the schema); bad
    // casts merely null the field and short rows are null-padded in
    // Spark 4 — only excess tokens trip the mode machinery
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.csv"),
      "id,v\n1,10\n2,20,extra,tokens\n3,30".getBytes)
    val schema = "id INT, v INT, _corrupt STRING"
    val permissive = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema).csv(dir).cache()
    assert(permissive.count() == 3)
    assert(permissive.filter(col("_corrupt").isNotNull).count() == 1)
    val dropped = spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema("id INT, v INT").csv(dir)
    // collect, not count: a bare count() prunes ALL columns from the CSV
    // parse, and unparsed rows can't be detected as malformed
    assert(dropped.collect().length == 2)
  }

  test("parquet schema evolution: mergeSchema unions column sets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir + "/p=1")
    Seq((2L, "b", 9.9)).toDF("id", "v1", "v2").write.parquet(dir + "/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "p"))
    // old files surface the new column as null
    assert(merged.filter(col("p") === 1).head.isNullAt(merged.columns.indexOf("v2")))
  }

  test("streaming dedup within watermark matches batch dropDuplicates keys") {
    import spark.implicits._
    val streamed = EventStreams.streamingDedup(spark, sf)
      .as[(Long, String)].collect().toSet
    val batch = graft.queries.T(spark, sf, "events")
      .dropDuplicates("user_id", "event_type")
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming sliding windows: rows cover both hour offsets") {
    val out = EventStreams.slidingRate(spark, sf)
    assert(out.count() > 0)
    val starts = out.select("win_start").collect().map(_.getString(0))
    assert(starts.exists(_.endsWith(":30:00")) && starts.exists(_.endsWith(":00:00")))
  }

  test("GraftExtensions: custom expressions SQL-callable") {
    val dot = spark.sql(
      "SELECT graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS v")
      .head.getDouble(0)
    assert(dot == 11.0)
    val mh = spark.sql(
      "SELECT graft_minhashes(array('a', 'b'), 2) AS sigs").head.getSeq[String](0)
    assert(mh.length == 2 && mh.forall(_.length == 32))
    // bloom pair: build over 0..9, membership hits inside, misses
    // outside. The filter side must be a scalar subquery (or literal) —
    // the same constraint Spark's own runtime filter satisfies — and the
    // probe key TYPE must match the build key type (xxhash64 hashes by
    // width: INT 5 and BIGINT 5 hash differently, like join key types).
    val hits = spark.sql("""
      SELECT graft_bloom_might_contain(
               (SELECT graft_bloom_agg(id, 10, 200) FROM range(10)),
               CAST(5 AS BIGINT)) AS hit,
             graft_bloom_might_contain(
               (SELECT graft_bloom_agg(id, 10, 200) FROM range(10)),
               CAST(123456 AS BIGINT)) AS miss""").head
    assert(hits.getBoolean(0) && !hits.getBoolean(1))
  }

  test("peer-search flow: deterministic, prospect served, topK bounded") {
    val flow = graft.flows.PeerSearchFlow
    val r1 = flow.run(spark, sf, flow.Config(minBatch = 2)).collect()
    val r2 = flow.run(spark, sf, flow.Config(minBatch = 2)).collect()
    assert(r1.sameElements(r2))
    assert(r1.exists(_.getAs[Long]("tgt_custkey") == -1L)) // injected prospect ranked
    val perTgt = r1.groupBy(_.getAs[Long]("tgt_custkey")).values.map(_.length)
    assert(perTgt.forall(_ <= 15))
  }

  test("stream-stream attribution join matches batch twin") {
    import spark.implicits._
    val streamed = EventStreams.streamStreamAttribution(spark, sf)
      .select("click_event", "purchase_event").as[(Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q63_attribution")(spark, sf)
      .select("click_event", "purchase_event").as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("foreachBatch parquet sink matches batch aggregation") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_feb").toString + "/agg"
    val streamed = EventStreams.foreachBatchToParquet(spark, sf, out)
      .as[(String, Long)].collect().toMap
    val batch = graft.queries.T(spark, sf, "events")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionizer matches batch gap-split sessions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapMs = 30 * 60000L
    val streamed = EventStreams.sessionsStateful(spark, sf, gapMin = 30)
      .as[(Long, Long, Long, Long)].collect().toSet
    // Batch twin: lag-gap boundaries -> running session id -> bounds.
    val ev = graft.queries.T(spark, sf, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
    val w = Window.partitionBy("user_id").orderBy("ms")
    val sess = ev
      .withColumn("new_s", when(
        col("ms") - lag("ms", 1).over(w) > gapMs || lag("ms", 1).over(w).isNull, 1L)
        .otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ms").as("start_ms"), max("ms").as("end_ms"),
        count(lit(1)).as("n_events"))
    val maxMs = ev.agg(max("ms")).head.getLong(0)
    val expectedClosed = sess
      .filter(col("end_ms") + gapMs < maxMs)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val all = sess.select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.subsetOf(all), "streamed sessions must be exact batch sessions")
    assert(expectedClosed.subsetOf(streamed),
      "every watermark-closed session must be emitted")
    assert(streamed.nonEmpty && expectedClosed.nonEmpty)
  }

  test("stateful streaming user counts match batch groupBy") {
    import spark.implicits._
    val streamed = EventStreams.statefulUserCounts(spark, sf)
      .as[(Long, Long)].collect().toMap
    val batch = graft.queries.T(spark, sf, "events")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("literal table injection + unionByName (S5/O5)") {
    val lit = Sources.literalTable(spark, Seq("a", "b"), Seq(Seq("1", "x"), Seq("2", null)))
    assert(lit.count() == 2)
    val merged = lit.unionByName(Sources.literalTable(spark, Seq("b", "a"), Seq(Seq("y", "3"))))
    assert(merged.count() == 3)
    assert(merged.filter(col("b").isNull).count() == 1)
  }

  test("randomSplit with fixed seed is reproducible (O6)") {
    val df = spark.range(1000).toDF("id")
    val a = df.randomSplit(Array(0.9, 0.1), seed = 100)(0).count()
    val b = df.randomSplit(Array(0.9, 0.1), seed = 100)(0).count()
    assert(a == b)
  }
}
