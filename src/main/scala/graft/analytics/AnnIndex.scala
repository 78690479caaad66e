package graft.analytics

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the trained ANN artifacts — the missing half of the
  * "train once, persist, share across runs" story the in-session memo
  * stores ([[KMeans.fitMemo]], `Pq.booksFor`) only cover for one JVM.
  *
  * Layout is index-as-table: centroids land as `(c, pos, x)` rows and PQ
  * codebooks as `(j, c, pos, x)` rows, one parquet directory per
  * artifact. Long form (not array columns) on purpose:
  *
  *   - exact round-trip — parquet doubles are bit-exact, and positions
  *     are explicit keys, so a reload reproduces the training output
  *     bit-for-bit with no dependence on row or element order;
  *   - queryable — index freshness checks ("how far did centroid 3
  *     move?") are plain SQL over the artifact table, the operational
  *     win of keeping index metadata IN the lake rather than in an
  *     opaque sidecar file;
  *   - tiny — k·dim (or M·Ksub·dsub) doubles; read with one driver
  *     collect exactly like the fit's own seed collect.
  *
  * At 100 TB the flow is: an index-build job calls `fit`/`fitAll` and
  * `save*`; every search session `load*`s the artifact (millisecond-scale
  * driver read) instead of re-running training jobs over the corpus.
  */
object AnnIndex {

  /** Cheap staleness fingerprint of a source parquet directory: a hash of
    * the sorted (name, length, mtime) listing, read driver-side from the
    * filesystem — zero Spark jobs. Rewriting the data at a path (new
    * files, new sizes, or new mtimes) changes the fingerprint, so a
    * persisted index trained on the old data can never be served for the
    * new ([[KMeans.fitPersistent]] keys memo entries AND artifact paths
    * by it — the staleness hazard a bare path-keyed memo has).
    */
  def sourceFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val s = it.next()
      entries += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
    }
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
    digest.take(8).map("%02x".format(_)).mkString
  }

  /** Whether a persisted artifact exists (checks for the parquet commit
    * marker, not just the directory — a killed writer leaves a partial
    * dir that must read as absent).
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Artifact-path-safe encoding of a memo key. */
  def sanitize(key: String): String =
    key.map(c => if (c.isLetterOrDigit || c == '-' || c == '.') c else '_')

  /** Write k-means centroids as a `(c, pos, x)` parquet table. */
  def saveCentroids(spark: SparkSession, path: String,
      cents: Array[Array[Double]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.flatMap { case (cv, c) =>
      cv.zipWithIndex.map { case (x, pos) => (c, pos, x) }
    }.toSeq.toDF("c", "pos", "x")
      .repartition(1) // k·dim doubles — one file, atomic swap by rename
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Reload centroids saved by [[saveCentroids]], bit-exact. */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"loadCentroids: empty index at $path")
    val k = rows.iterator.map(_.getInt(0)).max + 1
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    val out = Array.fill(k, dim)(Double.NaN)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    require(out.forall(_.forall(!_.isNaN)),
      s"loadCentroids: sparse index at $path (missing (c, pos) cells)")
    out
  }

  /** Write PQ codebooks as a `(j, c, pos, x)` parquet table. */
  def saveBooks(spark: SparkSession, path: String,
      books: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.flatMap { case (cv, c) =>
        cv.zipWithIndex.map { case (x, pos) => (j, c, pos, x) }
      }
    }.toSeq.toDF("j", "c", "pos", "x")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Reload codebooks saved by [[saveBooks]], bit-exact. */
  def loadBooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"loadBooks: empty index at $path")
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val k = rows.iterator.map(_.getInt(1)).max + 1
    val dsub = rows.iterator.map(_.getInt(2)).max + 1
    val out = Array.fill(m, k, dsub)(Double.NaN)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    require(out.forall(_.forall(_.forall(!_.isNaN))),
      s"loadBooks: sparse index at $path (missing (j, c, pos) cells)")
    out
  }
}
