package graft

import org.apache.spark.sql.functions._
import graft.ops.Itemsets

class ItemsetsSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force triple support over tiny baskets. */
  private def naive(rows: Seq[(Int, Int)], ms: Int): Set[(Int, Int, Int, Int)] = {
    val by = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val items = rows.map(_._2).distinct.sorted
    (for {
      a <- items; b <- items if b > a; c <- items if c > b
      s = by.values.count(bk => bk(a) && bk(b) && bk(c))
      if s >= ms
    } yield (a, b, c, s)).toSet
  }

  test("frequentTriples matches brute force, incl. the pruning boundary") {
    // Basket design: {1,2,3} appears 3x (frequent); {1,2,4} only 2x
    // (pair (1,4) frequent via other baskets but triple infrequent);
    // item 9 infrequent at level 1.
    val rows = Seq(
      10 -> 1, 10 -> 2, 10 -> 3, 10 -> 4,
      11 -> 1, 11 -> 2, 11 -> 3,
      12 -> 1, 12 -> 2, 12 -> 3, 12 -> 9,
      13 -> 1, 13 -> 2, 13 -> 4,
      14 -> 1, 14 -> 4, 14 -> 9)
    val df = rows.toDF("c", "p").repartition(4)
    val got = Itemsets.frequentTriples(df, "c", "p", 3)
      .select("pa", "pb", "pc", "support")
      .as[(Int, Int, Int, Int)].collect().toSet
    assert(got == naive(rows, 3))
    assert(got.contains((1, 2, 3, 3)))
    assert(!got.exists(t => t._1 == 9 || t._2 == 9 || t._3 == 9))
  }

  test("within-basket duplicates collapse before counting") {
    val rows = Seq(1 -> 7, 1 -> 7, 1 -> 8, 1 -> 9,
      2 -> 7, 2 -> 8, 2 -> 9)
    val df = rows.toDF("c", "p")
    val got = Itemsets.frequentTriples(df, "c", "p", 2)
      .as[(Int, Int, Int, Int)].collect().toSet
    assert(got == Set((7, 8, 9, 2)))
  }
}
