package graft

import org.apache.spark.sql.functions._

import graft.llm.HashedCosine

/** The hashed-bag retriever's two contracts: the Column-expression
  * score must match the literal integer recipe (dot²·10⁶ div ‖a‖²‖q‖²
  * over md5-bucketed count vectors — a monotone transform of cosine
  * since dot ≥ 0, quantized at 1e-6 with doc_id tiebreaks), and the
  * ranked list must be independent of partitioning. The recipe is
  * also oracle-pinned end-to-end by q274's full hash gate.
  */
class HashedCosineSpec extends SparkSuite {

  import spark.implicits._

  private val terms = Seq("alpha", "beta", "gamma")

  // deterministic synthetic docs mixing query terms and noise tokens
  private def docs = (1 to 300).map { i =>
    val toks = Seq.fill(i % 7)("alpha") ++ Seq.fill((i / 3) % 5)("beta") ++
      Seq.fill((i / 7) % 4)("gamma") ++
      (0 until (i % 11) + 1).map(j => s"noise${(i + j) % 40}")
    (i.toLong, toks)
  }.toDF("doc_id", "toks")

  test("fixed-point score matches the literal integer recipe; list is partition-invariant") {
    val k = 25
    val got = HashedCosine.topK(docs, "doc_id", "toks", terms, 64, k)
      .select("doc_id", "rnk").collect().map(r => (r.getLong(0), r.getInt(1)))
    // float-cosine reference over the same hashed-bag vectors
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      md.reset()
      val bytes = md.digest(t.getBytes("UTF-8"))
      (((java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong >>> 4) % 64).toInt)
    }
    val q = new Array[Long](64)
    terms.foreach(t => q(bucket(t)) += 1)
    val nq = q.map(x => x * x).sum
    val ref = docs.collect().map { r =>
      val a = new Array[Long](64)
      r.getSeq[String](1).foreach(t => a(bucket(t)) += 1)
      val dot = (0 until 64).map(j => a(j) * q(j)).sum
      val na = a.map(x => x * x).sum
      (r.getLong(0), dot * dot * 1000000L / (na * nq))
    }.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }
    assert(got.sortBy(_._2).toSeq == ref.toSeq,
      "fixed-point ranking diverged from the literal recipe")
    val got7 = HashedCosine.topK(docs.repartition(7), "doc_id", "toks", terms, 64, k)
      .select("doc_id", "rnk").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got7.sortBy(_._2).toSeq == got.sortBy(_._2).toSeq,
      "ranked list depends on partitioning")
  }
}
