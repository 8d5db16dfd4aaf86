package graft

import graft.engine.OutputWriter

class OutputWriterSpec extends SparkTestBase {
  import spark.implicits._

  private def resultDf = Seq(
    (0L, 1L, "a", 0.9), (0L, 2L, "b", 0.8), (1L, 1L, "b", 0.95)
  ).toDF("combo", "rank", "id", "score")

  test("S11: json and csv sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-out").toString
    OutputWriter.writeJson(resultDf, s"$dir/j")
    assert(spark.read.json(s"$dir/j").count() == 3)
    OutputWriter.writeCsv(resultDf, s"$dir/c", delimiter = "|")
    val back = spark.read.option("sep", "|").option("header", "true").csv(s"$dir/c")
    assert(back.count() == 3 && back.columns.toSeq == Seq("combo", "rank", "id", "score"))
  }

  test("S11: tabular text rendering") {
    val txt = OutputWriter.toTabular(resultDf.orderBy("combo", "rank"))
    assert(txt.linesIterator.size == 4)
    assert(txt.contains("| combo") && txt.contains("| a"))
  }

  test("S11: output-block sink writes ONE file per format, json = the " +
    "rendered SearchResponse array, csv = dialect-quoted rows") {
    import graft.engine.RequestParser.OutputSpec
    val dir = java.nio.file.Files.createTempDirectory("graft-single").toString
    // json: the file must hold the same SearchResponse array the REST
    // endpoint serves — not Spark part files of row-JSON
    OutputWriter.writeResults(resultDf, OutputSpec(format = "json"), s"$dir/out.json")
    val jf = new java.io.File(s"$dir/out.json")
    assert(jf.isFile, "json sink must be a single file")
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(jf)
    assert(tree.isArray && tree.size() == 2 &&
      tree.get(0).get("rankedResults").size() == 2)
    // csv: reference default delimiter is ";" (Constants.COLUMN_SEPARATOR);
    // values colliding with the dialect get quoted
    val withSemi = resultDf.withColumn("note",
      org.apache.spark.sql.functions.lit("a;b"))
    OutputWriter.writeResults(withSemi, OutputSpec(format = "csv"), s"$dir/out.csv")
    val lines = scala.io.Source.fromFile(s"$dir/out.csv").getLines().toSeq
    assert(lines.head == "combo;rank;id;score;note")
    assert(lines.size == 4 && lines(1).endsWith("\"a;b\""), lines.mkString("|"))
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("output-block delimiter parsing: explicit JSON null means the " +
    "default ';', empty string degrades to a space") {
    def parse(delimJson: String): String = {
      val tmp = java.nio.file.Files.createTempFile("graft-delim", ".json")
      java.nio.file.Files.write(tmp,
        s"""{"k": 3, "queries": [], "output": {"format": "csv"$delimJson}}"""
          .getBytes("UTF-8"))
      try graft.engine.RequestParser.parseSearchRequest(tmp.toString).output.delimiter
      finally java.nio.file.Files.delete(tmp)
    }
    assert(parse(""", "delimiter": null""") == ";") // NOT the literal "null"
    assert(parse("") == ";")
    assert(parse(", \"delimiter\": \"\"") == " ")
    assert(parse(""", "delimiter": "|"""") == "|")
  }

  test("S12: SearchResponse JSON shape, one object per weight combination") {
    val json = OutputWriter.toJsonResponse(resultDf)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(tree.size() == 2)
    assert(tree.get(0).get("rankedResults").size() == 2)
    assert(tree.get(0).get("rankedResults").get(0).get("id").asText() == "a")
    assert(tree.get(1).get("rankedResults").get(0).get("score").asDouble() == 0.95)
  }

  test("writeSharded: shard count tracks the byte target, contents intact, " +
    "empty input survives") {
    import spark.implicits._
    val text = "x" * 200
    val df = (0 until 1000).map(i => (i.toLong, text)).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-shard").toString
    // ~210 rendered bytes/row x 1000 rows; a 30 KB target wants ~7 shards
    OutputWriter.writeSharded(df, s"$dir/a", targetBytes = 30000)
    val files = new java.io.File(s"$dir/a").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5 && files.length <= 10,
      s"expected ~7 shards, got ${files.length}")
    val back = spark.read.parquet(s"$dir/a")
    assert(back.count() == 1000 &&
      back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
        == (0L until 1000L).sum)
    // a target far above the data -> one shard
    OutputWriter.writeSharded(df, s"$dir/b", targetBytes = 1L << 30)
    assert(new java.io.File(s"$dir/b").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    // empty input: a readable empty table, not a crash
    OutputWriter.writeSharded(df.where($"id" < 0), s"$dir/c", targetBytes = 1000)
    assert(spark.read.parquet(s"$dir/c").count() == 0)
  }

  test("writeSharded leaves a handoff manifest: rows/files/bytes/schema " +
    "match the written directory, and the `_` prefix keeps it out of " +
    "Spark's own listing") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, "y" * 100)).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    OutputWriter.writeSharded(df, s"$dir/m", targetBytes = 20000)
    val mf = new java.io.File(s"$dir/m/_graft_manifest.json")
    assert(mf.isFile, "manifest must exist beside the shards")
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(mf)
    val parts = new java.io.File(s"$dir/m").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(tree.get("rows").asLong() == 500L, tree.toString)
    assert(tree.get("files").asInt() == parts.length, tree.toString)
    assert(tree.get("bytes").asLong() == parts.map(_.length()).sum, tree.toString)
    assert(tree.get("max_file_bytes").asLong() ==
      parts.map(_.length()).max, tree.toString)
    assert(tree.get("schema").get("fields").size() == 2, tree.toString)
    // the sidecar is invisible to a plain parquet read
    assert(spark.read.parquet(s"$dir/m").count() == 500)
    // opt-out leaves no sidecar
    OutputWriter.writeSharded(df, s"$dir/n", targetBytes = 20000,
      manifest = false)
    assert(!new java.io.File(s"$dir/n/_graft_manifest.json").exists())
  }

  test("writeSharded calibration renders ONLY the sample: the optimized " +
    "plan keeps the nondeterministic row filter strictly BELOW the " +
    "to_json projection (the filter cannot push down past it, so the " +
    "order in the code IS the executed order)") {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val df = (0 until 1000).map(i => (i.toLong, "x" * 200)).toDF("id", "text")
      .repartition(4)
    val cal = OutputWriter.calibrationFrame(df, perPart = 3L)
    val plan = cal.queryExecution.optimizedPlan
    // Spark 4 rewrites to_json into Invoke(StructsToJsonEvaluator…) during
    // optimization — match the expression string, not the class name
    def hasJson(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.exists(_.toString.contains("StructsToJson"))
    // the render exists somewhere in the plan...
    assert(plan.exists(hasJson), s"expected a StructsToJson render in\n$plan")
    // ...but never at or below the sampling Filter — i.e. the full-corpus
    // rows are dropped BEFORE any row is JSON-rendered
    val filters = plan.collect { case f: Filter => f }
    assert(filters.nonEmpty, s"expected the sampling Filter in\n$plan")
    filters.foreach { f =>
      assert(!f.exists(hasJson),
        s"to_json must sit ABOVE the sampling filter, found it below in\n$plan")
    }
    // and the sample itself is per-partition bounded: 4 partitions x 3
    assert(cal.count() == 12)
  }
}
