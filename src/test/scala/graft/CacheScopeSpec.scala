package graft

import org.apache.spark.storage.StorageLevel

import graft.util.CacheScope

class CacheScopeSpec extends SparkTestBase {
  import spark.implicits._

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("withScope unpersists frames registered during it; outside a " +
    "scope register is a no-op (historical LRU behavior); nesting " +
    "releases only the inner scope's frames") {
    val outside = Seq(1, 2, 3).toDF("a").cache()
    CacheScope.register(outside)
    outside.count()
    assert(cached(outside), "no scope open: the cache must survive")

    var inner: org.apache.spark.sql.DataFrame = null
    var outer: org.apache.spark.sql.DataFrame = null
    CacheScope.withScope {
      outer = Seq(4, 5).toDF("a").cache()
      CacheScope.register(outer)
      outer.count()
      CacheScope.withScope {
        inner = Seq(6).toDF("a").cache()
        CacheScope.register(inner)
        inner.count()
        assert(cached(inner) && cached(outer))
      }
      // the inner scope closed: ITS frame released, the outer's kept.
      // unpersist is non-blocking, so poll briefly for the level change
      def eventually(f: => Boolean): Boolean =
        (0 until 50).exists { _ => if (f) true else { Thread.sleep(100); false } }
      assert(eventually(!cached(inner)), "inner frame must release at inner scope end")
      assert(cached(outer), "outer frame must survive the inner scope")
    }
    def eventually(f: => Boolean): Boolean =
      (0 until 50).exists { _ => if (f) true else { Thread.sleep(100); false } }
    assert(eventually(!cached(outer)), "outer frame must release at outer scope end")
    assert(cached(outside), "unscoped cache untouched by other scopes")
    outside.unpersist()
  }

  test("eager materializes the cache before consumers are planned and " +
    "registers it for scope release") {
    var df: org.apache.spark.sql.DataFrame = null
    CacheScope.withScope {
      df = CacheScope.eager(Seq(7, 8, 9).toDF("a"))
      // already materialized: every partition is in the store NOW, so
      // concurrent consumer stages are pure cache reads
      assert(cached(df))
      assert(df.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation] ||
        df.storageLevel != StorageLevel.NONE)
      assert(df.count() == 3)
    }
    def eventually(f: => Boolean): Boolean =
      (0 until 50).exists { _ => if (f) true else { Thread.sleep(100); false } }
    assert(eventually(df.storageLevel == StorageLevel.NONE))
  }

  test("eager outside a scope stays LAZY: no job is submitted at plan " +
    "construction and the cache fills only when a consumer runs") {
    // a library user composing plans lazily must not pay a count() at
    // operator-construction time; track job submission via the listener
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Thread.sleep(300) // let earlier tests' job-start events drain
      val before = counter.get()
      val df = CacheScope.eager(Seq(10, 11).toDF("a"))
      Thread.sleep(500) // job-start events are async; give one time to land
      assert(counter.get() == before,
        "eager outside a scope must not submit a Spark job")
      assert(df.count() == 2) // consuming it works and fills the cache
      assert(cached(df))
      df.unpersist()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pin materializes unconditionally — scope or no scope — so a " +
    "snapshot taken before mutating its source is really taken") {
    // outside any scope: pin must submit the count NOW (unlike eager,
    // which is lazy outside scopes and would read post-mutation state)
    val dir = java.nio.file.Files.createTempDirectory("graft-pin").toString
    Seq(1, 2, 3).toDF("a").write.mode("overwrite").parquet(dir)
    val snap = CacheScope.pin(spark.read.parquet(dir))
    assert(cached(snap))
    // mutate the source underneath the pinned frame the way the index
    // lifecycle does — a filesystem-level swap (IndexIO.swapDirs), which
    // Spark gets no refresh notification for
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
      .asScala.toList.foreach(java.nio.file.Files.delete)
    assert(snap.count() == 3, "pin must have captured the pre-mutation rows")
    snap.unpersist()
    // inside a scope it registers for release like eager
    var df: org.apache.spark.sql.DataFrame = null
    CacheScope.withScope {
      df = CacheScope.pin(Seq(4, 5).toDF("a"))
      assert(cached(df))
    }
    def eventually(f: => Boolean): Boolean =
      (0 until 50).exists { _ => if (f) true else { Thread.sleep(100); false } }
    assert(eventually(df.storageLevel == StorageLevel.NONE))
  }

  test("a throwing body still releases the scope's frames") {
    var df: org.apache.spark.sql.DataFrame = null
    intercept[RuntimeException] {
      CacheScope.withScope {
        df = CacheScope.eager(Seq(1).toDF("a"))
        throw new RuntimeException("boom")
      }
    }
    def eventually(f: => Boolean): Boolean =
      (0 until 50).exists { _ => if (f) true else { Thread.sleep(100); false } }
    assert(eventually(df.storageLevel == StorageLevel.NONE))
  }
}
