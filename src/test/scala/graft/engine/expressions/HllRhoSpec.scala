package graft.engine.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM contract of the HLL geometric rank: trailing zeros + 1,
  * capped at 53 so the estimator's 2^(53 − M_j) scaling can never see
  * a negative shift (reachable by a nonzero suffix only at p < 8).
  */
class HllRhoSpec extends AnyFunSuite {

  test("rho: trailing-zeros rank, zero-suffix and deep-suffix both cap at 53") {
    assert(Hll.rho(1L) == 1)          // ...0001 -> 0 trailing zeros
    assert(Hll.rho(2L) == 2)
    assert(Hll.rho(12L) == 3)         // ...1100
    assert(Hll.rho(1L << 51) == 52)   // deepest rank a p=8 suffix can hold
    assert(Hll.rho(1L << 52) == 53)   // p<8 territory: hits the cap exactly
    assert(Hll.rho(1L << 55) == 53, "cap must clamp deeper suffixes")
    assert(Hll.rho(0L) == 53, "empty suffix lands on the cap")
  }

  test("hash60 matches the md5-prefix recipe") {
    // first 15 hex chars of md5("42") = 'a1d0c6e83f027327' prefix
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.take(15)
    assert(Hll.hash60("42") == java.lang.Long.parseLong(hex, 16))
  }
}
