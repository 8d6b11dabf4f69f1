package graft.feature

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Fit-free categorical featurization for 100 TB tables.
  *
  * [[FeaturePipeline]] mirrors the reference's fitted encoders
  * (StringIndexer/OneHotEncoder — prod-recommendation-pyspark
  * src/features/build_features.py): each needs a vocabulary PASS over
  * the data and a vocabulary BROADCAST at transform time. At fact scale
  * both hurt: the pass is a full extra scan, and a high-cardinality
  * vocabulary (user ids, URLs) blows the broadcast. These two encoders
  * trade a little statistical crispness for zero fitting:
  *
  *  - [[hashFeatures]] — the hashing trick (Weinberger et al. 2009):
  *    project `feature=value` pairs into a fixed `dim`-bucket space with
  *    a signed hash; collisions cancel in expectation. No vocabulary, no
  *    fit, no broadcast — a pure per-row map.
  *  - [[looTargetEncode]] — leave-one-out target encoding: replace a
  *    category by the mean target of the OTHER rows in its group
  *    ((Σ_grp − y_i)/(n_grp − 1)), the standard leakage guard that keeps
  *    a row's own label out of its feature. One shuffle on the category.
  *
  * Both use the engine's md5-derived hash/exact-decimal disciplines, so
  * they are pure functions of the data — partitioning-independent and
  * SQL-oracle-able (unlike murmur3-seeded `hash()`, which no other
  * engine reproduces).
  */
object HashEncoder {

  /** Signed hashing-trick encoding: each (feature, value) pair lands in
    * bucket `hashRank("c=v") % dim` with sign from an independent
    * salted hash; per-row signs in the same bucket sum. Output: one row
    * per (id, non-empty bucket): (idCol, bucket INT, w BIGINT) — the
    * sparse vector rows a trainer consumes directly.
    */
  def hashFeatures(df: DataFrame, idCol: String, featureCols: Seq[String],
                   dim: Int): DataFrame = {
    val pairs = featureCols.map { c =>
      struct(lit(c).as("f"), col(c).cast("string").as("v"))
    }
    df.select(col(idCol), explode(array(pairs: _*)).as("e"))
      .select(col(idCol),
        (Sampling.hashRank(concat(col("e.f"), lit("="), col("e.v"))) % dim)
          .cast("int").as("bucket"),
        (Sampling.hashRank(concat(lit("s:"), col("e.f"), lit("="), col("e.v"))) % 2 * 2 - 1)
          .as("sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sign")).as("w"))
  }

  /** Leave-one-out mean-target encoding of `catCol` against `target`
    * (a price-like DOUBLE): the group sum runs in exact DECIMAL cents
    * (no float accumulation order to disagree on), with one final
    * double division rounded to 6 dp. Groups of size 1 encode NULL
    * (no other rows to borrow a mean from — the caller imputes).
    * Output: input row id + catCol + `loo_enc`.
    */
  def looTargetEncode(df: DataFrame, idCol: String, catCol: String,
                      target: String): DataFrame = {
    val cents = (col(target).cast("decimal(18,2)") * 100).cast("long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(catCol))
    df.select(col(idCol), col(catCol), cents.as("__cents"))
      .withColumn("__s", sum(col("__cents")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .select(col(idCol), col(catCol),
        when(col("__n") > 1,
          round((col("__s") - col("__cents")).cast("double")
            / (lit(100.0) * (col("__n") - 1)), 6)).as("loo_enc"))
  }
}
