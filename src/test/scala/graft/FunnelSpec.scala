package graft

import java.sql.Timestamp

import graft.ops.Funnel

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  test("strict-order first-touch semantics: out-of-order and missing steps don't count") {
    val rows = Seq(
      // u1: clean full funnel
      (1L, "signup", t(0)), (1L, "view", t(10)), (1L, "click", t(20)),
      (1L, "purchase", t(30)),
      // u2: view BEFORE signup — that view must not count; a later view
      // rescues the chain but there is no click after it
      (2L, "view", t(0)), (2L, "signup", t(5)), (2L, "view", t(9)),
      (2L, "click", t(7)),   // click before the qualifying view: dead
      // u3: never signed up — enters no step even with later activity
      (3L, "view", t(1)), (3L, "click", t(2)), (3L, "purchase", t(3)),
      // u4: same-second events — strict "after" rejects the tie
      (4L, "signup", t(4)), (4L, "view", t(4)),
      // u5: signup only
      (5L, "signup", t(8)),
      // u6: multiple signups — first-touch anchors at the EARLIEST, so
      // the view between them still counts
      (6L, "signup", t(0)), (6L, "view", t(1)), (6L, "signup", t(2)),
      (6L, "click", t(3))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.funnel(rows, "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(r("signup") == 5L, s"u1,u2,u4,u5,u6 signed up: $r")  // not u3
    assert(r("view") == 3L, s"u1, u2 (the t9 view), u6: $r")    // u4 tied
    assert(r("click") == 2L, s"u1 and u6 only: $r")
    assert(r("purchase") == 1L, s"only u1 completes: $r")
  }

  test("conversion percentages read from exact counts; zero-entry funnel yields null rates") {
    val rows = Seq(
      (1L, "signup", t(0)), (1L, "view", t(1)),
      (2L, "signup", t(0)), (3L, "signup", t(0)), (4L, "signup", t(0))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.funnel(rows, "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase")).collect()
    assert(r(0).getDouble(3) == 100.0 && r(0).getDouble(4) == 100.0)
    assert(r(1).getDouble(3) == 25.0 && r(1).getDouble(4) == 25.0)
    assert(r(2).getLong(2) == 0L && r(2).getDouble(3) == 0.0)
    // pct_of_prev for click divides by view's 1 -> 0.0; purchase
    // divides by click's 0 -> null, not a division error
    assert(r(3).isNullAt(4), "0/0 step rate must be null, not an error")

    // nobody enters the funnel at all: every rate is null
    val empty = Seq((1L, "view", t(0))).toDF("user_id", "event_type", "ts")
    val e = Funnel.funnel(empty, "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase")).collect()
    assert(e.forall(_.getLong(2) == 0L || !e.head.isNullAt(2)))
    assert(e.head.isNullAt(3), "0-entry funnel must null its rates")
  }

  test("funnelWindowed: the conversion window binds per transition, first-touch stays greedy") {
    // t(s) steps are 1 s apart; window = 5 s
    val rows = Seq(
      // u1: every transition within 5 s — converts fully
      (1L, "signup", t(0)), (1L, "view", t(3)), (1L, "click", t(6)),
      (1L, "purchase", t(9)),
      // u2: view 10 s after signup — outside the window, chain dies at
      // signup even though a click follows the view quickly
      (2L, "signup", t(0)), (2L, "view", t(10)), (2L, "click", t(11)),
      // u3: first-touch anchors at the FIRST in-window view (t4), so
      // the click at t12 > t4+5 dies — even though anchoring at the
      // second view (t8) would have rescued it (the documented greedy
      // convention, same as the unwindowed funnel)
      (3L, "signup", t(0)), (3L, "view", t(4)), (3L, "view", t(8)),
      (3L, "click", t(12)),
      // u4: view at EXACTLY signup + window — the bound is inclusive
      (4L, "signup", t(0)), (4L, "view", t(5))
    ).toDF("user_id", "event_type", "ts")
    val w5 = 5L * 1000000L
    val r = Funnel.funnelWindowed(rows, "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"), w5)
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(r("signup") == 4L)
    assert(r("view") == 3L, s"u1, u3 (t4), u4 boundary: $r")
    assert(r("click") == 1L, s"only u1; u2 out-of-window, u3 greedy-dead: $r")
    assert(r("purchase") == 1L)
    // the unwindowed funnel rescues u2 and u3 — the window is the only
    // difference between the two readouts
    val u = Funnel.funnel(rows, "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(u("view") == 4L && u("click") == 3L)
  }

  test("stepDurations: exact rank-⌈p·n⌉ quantiles per transition; empty transitions emit no row") {
    // signup→view deltas: u1 10 s, u2 20 s, u3 30 s (n = 3:
    // p50 rank ⌈1.5⌉ = 2 → 20 s; p90 rank ⌈2.7⌉ = 3 → 30 s);
    // view→click: only u1 converts (5 s); click→purchase: nobody
    val rows = Seq(
      (1L, "signup", t(0)), (1L, "view", t(10)), (1L, "click", t(15)),
      (2L, "signup", t(0)), (2L, "view", t(20)),
      (3L, "signup", t(0)), (3L, "view", t(30)),
      (4L, "signup", t(0))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.stepDurations(rows, "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .collect().map(x => x.getInt(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(2) == (("view", 3L, 20000000L, 30000000L)), s"got ${r.get(2)}")
    assert(r(3) == (("click", 1L, 5000000L, 5000000L)))
    assert(!r.contains(4), "a transition nobody completes must emit no row")
  }
}
