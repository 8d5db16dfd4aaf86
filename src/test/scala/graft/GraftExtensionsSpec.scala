package graft

/** The SparkSessionExtensions surface: graft kernels as SQL functions. */
class GraftExtensionsSpec extends SparkTestBase {

  test("graft_* SQL functions register and run inside spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine_sim(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d, 3.0d)) c,
        |  graft_l2_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) l2,
        |  graft_l1_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) l1
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 7.0)
  }

  test("registered functions agree with the Column API over real embeddings") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v").limit(50)
    emb.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, graft_cosine_sim(a.v, b.v) c
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id < b.vec_id""".stripMargin)
      .orderBy("ia", "ib").collect().map(_.getDouble(2))
    val viaCol = {
      import org.apache.spark.sql.functions._
      val a = emb.select(col("vec_id").as("ia"), col("v").as("va"))
      val b = emb.select(col("vec_id").as("ib"), col("v").as("vb"))
      a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          graft.functions.NativeKernels.cosineSim(col("va"), col("vb")).as("c"))
        .orderBy("ia", "ib").collect().map(_.getDouble(2))
    }
    assert(viaSql.length == viaCol.length && viaSql.sameElements(viaCol))
  }

  test("composed kernels register as SQL functions: graft_html_to_text " +
    "and graft_normalize_url match their Column forms") {
    GraftExtensions.register(spark)
    val html = "<html><head><script>x</script></head>" +
      "<body><p>Hello &amp; world</p><div>two</div></body></html>"
    val url = "HTTPS://ExAmple.COM:443/a/b/?utm_source=x&b=2&a=1#frag"
    val r = spark.sql(
      s"""SELECT graft_html_to_text('${html.replace("'", "\\'")}') t,
        |  graft_normalize_url('$url') u""".stripMargin).head()
    assert(r.getString(0) == "Hello & world two")
    assert(r.getString(1) == "https://example.com/a/b?a=1&b=2")
    assert(spark.sql("SELECT graft_url_host('HTTP://WWW.Ex.COM:8080/p')")
      .head().getString(0) == "ex.com")
  }

  test("arity is validated with a clear message") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_l2_dist(array(1.0d))").head()
    }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("graft_l2_dist"))
  }

  test("graft_hash_pct matches Sampling.hashPct and bounds to [0, 100)") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT id, graft_hash_pct(id) p FROM range(0, 500)")
      .orderBy("id").collect().map(_.getLong(1))
    val viaCol = spark.range(0, 500)
      .select(col("id"), graft.operators.Sampling.hashPct(col("id")).as("p"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(viaSql.sameElements(viaCol))
    assert(viaSql.forall(p => p >= 0 && p < 100))
  }

  test("graft_band_keys matches the Column API and validates literal args") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_band_keys(
        |  array_distinct(filter(transform(split(text, ' '), t -> trim(t)), t -> t != '')),
        |  16, 4, 4) bk FROM docs_ext""".stripMargin)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val toks = array_distinct(graft.functions.TextKernels.wordTokens(col("text")))
    val viaCol = docs.select(col("doc_id"),
        graft.functions.NativeKernels.bandKeys(toks, 16, 4, 4).as("bk"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(viaSql.length == 50 && viaSql.zip(viaCol).forall { case (a, b) => a == b })
    val e = intercept[Exception] {
      spark.sql("SELECT graft_band_keys(array('a'), 16, 4)").head()
    }
    assert(e.getMessage.contains("4 arguments") || e.getMessage.contains("graft_band_keys"))
  }

  test("graft_compress_ratio matches the Column API and bounds sensibly") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    docs.createOrReplaceTempView("docs_ext3")
    val viaSql = spark.sql("SELECT doc_id, graft_compress_ratio(text) r FROM docs_ext3")
      .orderBy("doc_id").collect().map(_.getDouble(1))
    val viaCol = docs.select(col("doc_id"),
        graft.functions.NativeKernels.compressRatio(col("text")).as("r"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(viaSql.sameElements(viaCol))
    assert(viaSql.forall(r => r > 0.0 && r < 1.2))
  }

  test("graft_simhash_bands and graft_fingerprint match their Column-API twins") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("docs_ext2")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash_bands(filter(transform(split(text, ' '), t -> trim(t)), t -> t != '')) sb,
        |  graft_fingerprint(text) fp
        |FROM docs_ext2""".stripMargin)
      .orderBy("doc_id").collect().map(r => (r.getSeq[Int](1), r.getString(2)))
    val viaCol = docs.select(col("doc_id"),
        graft.functions.NativeKernels.simhashBands(
          graft.functions.TextKernels.wordTokens(col("text"))).as("sb"),
        graft.functions.TextKernels.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect().map(r => (r.getSeq[Int](1), r.getString(2)))
    assert(viaSql.length == 50 && viaSql.zip(viaCol).forall { case (a, b) => a == b })
  }
}
