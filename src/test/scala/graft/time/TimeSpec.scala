package graft.time

import java.time.{Duration, Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite

class TimeSpec extends AnyFunSuite {
  private val utc = ZoneId.of("UTC")
  // 2022-01-15 13:45:30 UTC
  private val now = Instant.ofEpochSecond(1642254330L)

  test("step math") {
    assert(StepMath.gcd(12, 18) == 6)
    assert(StepMath.lcm(4, 6) == 12)
    assert(StepMath.combineSteps(0, 10) == 10)
    assert(StepMath.combineSteps(10, 60) == 60)
    assert(StepMath.combineSteps(10, 15) == 30)
    assert(StepMath.ceilDiv(10, 3) == 4)
    assert(StepMath.ceilToMultiplier(10, 4) == 12)
    assert(StepMath.floorToMultiplier(10, 4) == 8)
    assert(StepMath.ceilToMultiplier(12, 4) == 12)
  }

  test("aggregated step honors maxDataPoints") {
    // range 1000s, lcm 10, mdp 100 -> ceil(1000/100)=10 -> 10
    assert(StepMath.aggregatedStep(10, 0, 1000, 100) == 10)
    // range 1000s, lcm 10, mdp 30 -> ceil(1000/30)=34 -> ceil to mult of 10 = 40
    assert(StepMath.aggregatedStep(10, 0, 1000, 30) == 40)
  }

  test("alignment and grid bounds") {
    assert(StepMath.alignFromUntil(105, 298, 10) == (110, 299))
    assert(StepMath.gridBounds(105, 298, 10) == (110, 300))
    // exact boundaries
    assert(StepMath.alignFromUntil(100, 300, 10) == (100, 309))
    assert(StepMath.gridBounds(100, 300, 10) == (100, 310))
  }

  test("epoch and now") {
    assert(TimeGrammar.parse("1642254330", utc, now) == 1642254330L)
    assert(TimeGrammar.parse("now", utc, now) == now.getEpochSecond)
    assert(TimeGrammar.parse("", utc, now) == 0L)
    assert(TimeGrammar.parse("garbage", utc, now) == 0L)
  }

  test("relative offsets") {
    assert(TimeGrammar.parse("-1d", utc, now) == now.getEpochSecond - 86400)
    assert(TimeGrammar.parse("-1h30min", utc, now) == now.getEpochSecond - 5400)
    assert(TimeGrammar.parse("+2h", utc, now) == now.getEpochSecond + 7200)
    assert(TimeGrammar.parse("-30", utc, now) == now.getEpochSecond - 30)
  }

  test("rnow truncation") {
    assert(TimeGrammar.parse("rnow", utc, now, Duration.ofSeconds(10)) ==
      now.getEpochSecond - now.getEpochSecond % 10)
    assert(TimeGrammar.parse("rnow-30", utc, now, Duration.ofSeconds(10)) ==
      now.getEpochSecond - now.getEpochSecond % 10 - 30)
  }

  test("named times on today's date") {
    // midnight of 2022-01-15 UTC = 1642204800
    assert(TimeGrammar.parse("midnight", utc, now) == 1642204800L)
    assert(TimeGrammar.parse("noon", utc, now) == 1642204800L + 12 * 3600)
    assert(TimeGrammar.parse("teatime", utc, now) == 1642204800L + 16 * 3600)
    assert(TimeGrammar.parse("yesterday", utc, now) == 1642204800L - 86400)
    assert(TimeGrammar.parse("tomorrow", utc, now) == 1642204800L + 86400)
  }

  test("date formats") {
    assert(TimeGrammar.parse("20220115", utc, now) == 1642204800L)
    assert(TimeGrammar.parse("01/15/22", utc, now) == 1642204800L)
    assert(TimeGrammar.parse("17:05_20220115", utc, now) ==
      1642204800L + 17 * 3600 + 5 * 60)
  }

  test("composite base+offset") {
    assert(TimeGrammar.parse("now-1d", utc, now) == now.getEpochSecond - 86400)
    assert(TimeGrammar.parse("now-1d+2h", utc, now) ==
      now.getEpochSecond - 86400 + 7200)
    assert(TimeGrammar.parse("midnight+1h", utc, now) == 1642204800L + 3600)
  }
}
