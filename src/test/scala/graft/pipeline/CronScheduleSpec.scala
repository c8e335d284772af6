package graft.pipeline

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class CronScheduleSpec extends AnyFunSuite {

  private def t(s: String) = LocalDateTime.parse(s)

  test("daily 2am: next from before/after the match") {
    val c = CronSchedule.parse("0 0 2 * * ?")
    assert(c.next(t("2024-03-01T00:30:00")) == Some(t("2024-03-01T02:00:00")))
    assert(c.next(t("2024-03-01T02:00:00")) == Some(t("2024-03-02T02:00:00")),
      "next is strictly after")
    assert(c.matches(t("2024-03-05T02:00:00")))
    assert(!c.matches(t("2024-03-05T02:00:01")))
  }

  test("every 15 minutes with step syntax") {
    val c = CronSchedule.parse("0 */15 * * * ?")
    assert(c.next(t("2024-03-01T10:07:00")) == Some(t("2024-03-01T10:15:00")))
    assert(c.next(t("2024-03-01T10:45:00")) == Some(t("2024-03-01T11:00:00")))
  }

  test("weekday-at-9 via day names; Quartz numbering 1=SUN") {
    val c = CronSchedule.parse("0 0 9 ? * MON-FRI")
    // 2024-03-01 is a Friday; 2024-03-02 Saturday skips to Monday 03-04
    assert(c.next(t("2024-03-01T09:00:00")) == Some(t("2024-03-04T09:00:00")))
    val numeric = CronSchedule.parse("0 0 9 ? * 2-6") // MON=2..FRI=6
    assert(numeric.next(t("2024-03-01T09:00:00")) ==
      Some(t("2024-03-04T09:00:00")))
  }

  test("month names, lists, and ranges") {
    val c = CronSchedule.parse("0 30 6 1,15 JAN,JUL *")
    assert(c.next(t("2024-01-15T06:30:00")) == Some(t("2024-07-01T06:30:00")))
    assert(c.next(t("2024-07-15T06:30:00")) == Some(t("2025-01-01T06:30:00")))
  }

  test("restricted dom AND dow fire on the union (classic cron)") {
    val c = CronSchedule.parse("0 0 12 13 * FRI")
    // 2024-09-13 is a Friday (both match); 2024-09-06 is a Friday (dow
    // only); 2024-10-13 is a Sunday (dom only)
    assert(c.matches(t("2024-09-13T12:00:00")))
    assert(c.matches(t("2024-09-06T12:00:00")))
    assert(c.matches(t("2024-10-13T12:00:00")))
    assert(!c.matches(t("2024-09-12T12:00:00")))
  }

  test("an impossible date refuses via the horizon, not an infinite loop") {
    val c = CronSchedule.parse("0 0 0 31 FEB ?")
    assert(c.next(t("2024-01-01T00:00:00")).isEmpty)
  }

  test("malformed and unsupported expressions refuse loudly") {
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 * *") }
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 25 * * ?") }
    intercept[IllegalArgumentException] {
      CronSchedule.parse("0 0 2 * * ? 2024")
    }
    // specials must stand alone with '?' opposite, exactly as in Quartz
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 1,L * ?") }
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 L * MON") }
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 15 * 6#3") }
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 ? * 6#6") }
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 33W * ?") }
  }

  test("L: last day of month, with offset") {
    val c = CronSchedule.parse("0 0 12 L * ?")
    assert(c.next(t("2024-02-01T00:00:00")) == Some(t("2024-02-29T12:00:00")),
      "leap February")
    assert(c.next(t("2024-02-29T12:00:00")) == Some(t("2024-03-31T12:00:00")))
    assert(c.matches(t("2025-02-28T12:00:00")))
    val off = CronSchedule.parse("0 0 12 L-2 * ?")
    assert(off.next(t("2024-02-01T00:00:00")) == Some(t("2024-02-27T12:00:00")))
    assert(off.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-29T12:00:00")))
  }

  test("LW and nW: nearest-weekday resolution never leaves the month") {
    val lw = CronSchedule.parse("0 0 12 LW * ?")
    // 2024-03-31 is a Sunday -> last weekday is Friday the 29th
    assert(lw.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-29T12:00:00")))
    // 2024-11-30 is a Saturday -> Friday the 29th
    assert(lw.next(t("2024-11-01T00:00:00")) == Some(t("2024-11-29T12:00:00")))
    // 2024-07-31 is a Wednesday -> itself
    assert(lw.next(t("2024-07-01T00:00:00")) == Some(t("2024-07-31T12:00:00")))
    val w15 = CronSchedule.parse("0 0 12 15W * ?")
    // 2024-06-15 Saturday -> Friday the 14th
    assert(w15.next(t("2024-06-01T00:00:00")) == Some(t("2024-06-14T12:00:00")))
    // 2024-09-15 Sunday -> Monday the 16th
    assert(w15.next(t("2024-09-01T00:00:00")) == Some(t("2024-09-16T12:00:00")))
    // 2024-03-15 Friday -> itself
    assert(w15.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-15T12:00:00")))
    val w1 = CronSchedule.parse("0 0 12 1W * ?")
    // 2024-06-01 Saturday: may not cross into May -> Monday the 3rd
    assert(w1.next(t("2024-06-01T00:00:00")) == Some(t("2024-06-03T12:00:00")))
    // 2024-09-01 Sunday -> Monday the 2nd
    assert(w1.next(t("2024-09-01T00:00:00")) == Some(t("2024-09-02T12:00:00")))
  }

  test("nW in a month without day n does not fire (Quartz, no clamping)") {
    val w31 = CronSchedule.parse("0 0 12 31W * ?")
    // April 2024 has 30 days: '31W' must NOT slide to April's last
    // weekday — the next fire is May 31 (a Friday, so itself)
    assert(w31.next(t("2024-04-01T00:00:00")) == Some(t("2024-05-31T12:00:00")))
    // February never fires: from Feb 1 the next fire skips to March
    // (2024-03-31 is a Sunday -> preceding Friday the 29th)
    assert(w31.next(t("2024-02-01T00:00:00")) == Some(t("2024-03-29T12:00:00")))
  }

  test("bare L in day-of-week means plain SAT (every Saturday); 7L is the last one") {
    // Quartz CronExpression: bare 'L' in dow "simply means 7 or SAT" —
    // it fires EVERY Saturday, unlike '7L' (the month's last Saturday)
    val every = CronSchedule.parse("0 0 12 ? * L")
    assert(every.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-02T12:00:00")))
    assert(every.next(t("2024-03-02T13:00:00")) == Some(t("2024-03-09T12:00:00")))
    val last = CronSchedule.parse("0 0 12 ? * 7L")
    // Saturdays of March 2024: 2, 9, 16, 23, 30 -> last is the 30th
    assert(last.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-30T12:00:00")))
  }

  test("dL and d#n: last / nth weekday of the month") {
    val friL = CronSchedule.parse("0 0 12 ? * 6L")
    assert(friL.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-29T12:00:00")))
    val named = CronSchedule.parse("0 0 12 ? * FRIL")
    assert(named.next(t("2024-03-01T00:00:00")) == Some(t("2024-03-29T12:00:00")))
    val fri3 = CronSchedule.parse("0 0 12 ? * 6#3")
    // Fridays of March 2024: 1, 8, 15, 22, 29 -> third is the 15th
    assert(fri3.next(t("2024-03-01T12:00:00")) == Some(t("2024-03-15T12:00:00")))
    // a month WITHOUT an nth occurrence skips: Mondays of March 2024 are
    // 4, 11, 18, 25 (no 5th) -> first 5th Monday is April 29
    val mon5 = CronSchedule.parse("0 0 12 ? * 2#5")
    assert(mon5.next(t("2024-03-01T00:00:00")) == Some(t("2024-04-29T12:00:00")))
  }

  test("seconds field is honored (Quartz, not classic 5-field)") {
    val c = CronSchedule.parse("30 0 * * * ?")
    assert(c.next(t("2024-03-01T10:00:29")) == Some(t("2024-03-01T10:00:30")))
    assert(c.next(t("2024-03-01T10:00:30")) == Some(t("2024-03-01T11:00:30")))
  }
}
