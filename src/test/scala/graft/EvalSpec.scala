package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

class EvalSpec extends SparkSuite {
  import spark.implicits._

  /** O(P·N) reference AUC: P(s+>s-) + 0.5·P(s+=s-). */
  private def naiveAuc(rows: Seq[(Double, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size)
  }

  private def naiveKs(rows: Seq[(Double, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    rows.map(_._1).distinct.map { t =>
      math.abs(pos.count(_ <= t).toDouble / pos.size -
        neg.count(_ <= t).toDouble / neg.size)
    }.max
  }

  test("aucKs matches the quadratic definition on tie-heavy data") {
    val rows = Seq(
      (0.1, false), (0.1, true), (0.2, false), (0.2, false), (0.2, true),
      (0.3, true), (0.3, true), (0.3, false), (0.5, true), (0.5, true),
      (0.05, false), (0.9, true), (0.9, false))
    val df = rows.toDF("s", "y").repartition(5)
    val r = Eval.aucKs(df, "s", "y").head()
    assert(r.getAs[Long]("n_pos") == rows.count(_._2))
    assert(r.getAs[Long]("n_neg") == rows.count(!_._2))
    assert(math.abs(r.getAs[Double]("auc") - naiveAuc(rows)) < 1e-6)
    assert(math.abs(r.getAs[Double]("ks") - naiveKs(rows)) < 1e-6)
  }

  test("perfect and inverted scorers hit 1.0 / 0.0; constant scorer 0.5") {
    val perfect = (1 to 50).map(i => (i.toDouble, i > 25))
    val rp = Eval.aucKs(perfect.toDF("s", "y"), "s", "y").head()
    assert(rp.getAs[Double]("auc") == 1.0 && rp.getAs[Double]("ks") == 1.0)
    val inverted = perfect.map { case (s, y) => (s, !y) }
    val ri = Eval.aucKs(inverted.toDF("s", "y"), "s", "y").head()
    assert(ri.getAs[Double]("auc") == 0.0)
    val const = (1 to 40).map(i => (7.0, i % 3 == 0))
    val rc = Eval.aucKs(const.toDF("s", "y"), "s", "y").head()
    assert(rc.getAs[Double]("auc") == 0.5 && rc.getAs[Double]("ks") == 0.0)
  }
}
