package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-index contract: a reloaded artifact is BIT-identical to
  * the trained one, so a search session composed from loaded centroids /
  * codebooks produces byte-for-byte the results of the session that
  * trained them — the "train once, persist, share across runs" flow every
  * ANN scaladoc promises.
  */
class AnnIndexSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    spark.range(0, 64).toDF("id")
      .withColumn("v", expr(
        """transform(sequence(0, 15), d ->
          |  cast((id * 13 + d * 7) % 17 as double) + id * 0.25D)""".stripMargin))
      .select($"id".as("vec_id"), $"v")
  }

  test("centroids round-trip bit-exact through parquet") {
    val cents = KMeans.fit(corpus, "vec_id", "v", k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-cents").toString
    AnnIndex.saveCentroids(spark, dir, cents)
    val back = AnnIndex.loadCentroids(spark, dir)
    assert(back.length === cents.length)
    cents.indices.foreach { c =>
      assert(back(c).toSeq === cents(c).toSeq, s"centroid $c drifted")
    }
  }

  test("codebooks round-trip bit-exact and searches from the loaded index match") {
    import spark.implicits._
    val c = corpus
    val cents = KMeans.fit(c, "vec_id", "v", k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-books").toString
    AnnIndex.saveCentroids(spark, dir + "/coarse", cents)
    val loaded = AnnIndex.loadCentroids(spark, dir + "/coarse")
    // assignment under the loaded artifact == assignment under the
    // trained one, row for row (bit-identical centroids → identical plan)
    val a1 = c.select($"vec_id", KMeans.assignExpr($"v", cents).as("c")).collect()
    val a2 = c.select($"vec_id", KMeans.assignExpr($"v", loaded).as("c")).collect()
    assert(a1.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      a2.map(r => (r.getLong(0), r.getInt(1))).toSeq)
    // PQ books (M=8 over dim 16 → dsub=2)
    val books = SimilarityQueries.Pq.fitAll(c, iters = 2)
    AnnIndex.saveBooks(spark, dir + "/books", books)
    val booksBack = AnnIndex.loadBooks(spark, dir + "/books")
    books.indices.foreach { j =>
      books(j).indices.foreach { cc =>
        assert(booksBack(j)(cc).toSeq === books(j)(cc).toSeq,
          s"codebook ($j, $cc) drifted")
      }
    }
  }

  test("empty and sparse artifacts fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bad").toString
    import spark.implicits._
    // valid schema, missing (c=1, pos=1) cell
    Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)).toDF("c", "pos", "x")
      .write.mode("overwrite").parquet(dir + "/sparse")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.loadCentroids(spark, dir + "/sparse")
    }
    assert(e.getMessage.contains("sparse"))
  }
}
