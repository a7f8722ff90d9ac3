package graft.llm

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * `bruteForceTopK` is the exact baseline — a broadcast of the (small)
  * query set against the corpus, cosine inside codegen, per-query top-k
  * via TakeOrdered-style window. `lshSimilarityJoin` is the scale path:
  * random-hyperplane bucketing (Spark ML's BucketedRandomProjectionLSH)
  * turns the all-pairs scan into a bucket equi-join; unit-norm vectors
  * make euclidean-LSH equivalent to cosine ordering
  * (cos = 1 - d²/2 for unit vectors).
  */
object Similarity {

  /** Elementwise-exact cosine: per-element double products folded left to
    * right — deterministic and engine-portable (no BLAS reordering). */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast(DoubleType))
    val prods = zip_with(d(a), d(b), (x, y) => x * y)
    val dot = aggregate(prods, lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(d(a), x => x * x), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(d(b), x => x * x), lit(0.0), (acc, x) => acc + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k cosine neighbors for each query vector. The query side
    * is expected to be small (broadcast); the corpus side streams. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc_nulls_last("cosine"), asc_nulls_last("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Approximate similarity join via random-projection LSH. Returns
    * candidate pairs with their euclidean distance (unit-norm vectors →
    * cosine = 1 - dist²/2). `bucketLength`/`numHashTables` trade recall
    * for bucket size; at 100 TB the join shuffles by bucket hash only. */
  def lshSimilarityJoin(
      df: DataFrame, idCol: String, vecCol: String,
      maxDistance: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5): DataFrame = {
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = df.select(col(idCol).as("id"), toVec(col(vecCol)).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "dist")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        col("dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Approximate top-k for one query vector (IVF-style probe). */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      numHashTables: Int = 8, bucketLength: Double = 0.5): DataFrame = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = df.select(col(idCol).as("id"), toVec(col(vecCol)).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxNearestNeighbors(
      vecs, Vectors.dense(query.map(_.toDouble)), k, "dist")
      .select(col("id"), col("dist"))
  }
}
