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
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 L * ?") }
    intercept[IllegalArgumentException] { CronSchedule.parse("0 0 2 ? * 6#3") }
    intercept[IllegalArgumentException] {
      CronSchedule.parse("0 0 2 * * ? 2024")
    }
  }

  test("seconds field is honored (Quartz, not classic 5-field)") {
    val c = CronSchedule.parse("30 0 * * * ?")
    assert(c.next(t("2024-03-01T10:00:29")) == Some(t("2024-03-01T10:00:30")))
    assert(c.next(t("2024-03-01T10:00:30")) == Some(t("2024-03-01T11:00:30")))
  }
}
