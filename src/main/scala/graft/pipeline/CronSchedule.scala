package graft.pipeline

import java.time.LocalDateTime

/** Quartz-style cron expressions for flow/job scheduling — the
  * reference's standalone scheduler registers every `job.schedule`
  * through Quartz's CronScheduleBuilder (gobblin-runtime/.../scheduler/
  * JobScheduler.java:595), and GaaS hands the same shape to Azkaban
  * projects. Supported: the 6-field Quartz core `sec min hour
  * day-of-month month day-of-week` (a 7th year field is accepted and
  * must be `*`), with `*`, `?` (dom/dow no-preference), lists `a,b`,
  * ranges `a-b`, step syntax `/n` over `*` or a range, month names
  * JAN..DEC and day
  * names SUN..SAT (Quartz numbering: 1 = SUN). The calendar-juggling
  * specials `L W #` are refused loudly rather than approximated. When
  * both day-of-month and day-of-week are restricted, a date matching
  * EITHER fires (classic-cron union; Quartz itself refuses that
  * combination). All evaluation is driver-side wall-clock in the
  * caller's zone — scheduling is control-plane bookkeeping, never a
  * data-plane concern. */
final case class CronSchedule(seconds: Set[Int], minutes: Set[Int],
                              hours: Set[Int], daysOfMonth: Option[Set[Int]],
                              months: Set[Int], daysOfWeek: Option[Set[Int]],
                              expr: String) {

  private def dayMatches(t: LocalDateTime): Boolean = {
    if (!months.contains(t.getMonthValue)) return false
    // java DayOfWeek: MON=1..SUN=7 -> Quartz: SUN=1..SAT=7
    val quartzDow = t.getDayOfWeek.getValue % 7 + 1
    (daysOfMonth, daysOfWeek) match {
      case (None, None) => true
      case (Some(dom), None) => dom.contains(t.getDayOfMonth)
      case (None, Some(dow)) => dow.contains(quartzDow)
      case (Some(dom), Some(dow)) => // classic-cron union
        dom.contains(t.getDayOfMonth) || dow.contains(quartzDow)
    }
  }

  def matches(t: LocalDateTime): Boolean =
    dayMatches(t) && hours.contains(t.getHour) &&
      minutes.contains(t.getMinute) && seconds.contains(t.getSecond)

  /** The first fire time strictly AFTER `after`; refuses (None) past a
    * 4-year horizon — an expression that never fires inside 4 years
    * (e.g. Feb 30) is a configuration error to surface, not to spin
    * on. */
  def next(after: LocalDateTime): Option[LocalDateTime] = {
    var day = after.toLocalDate
    val horizon = day.plusYears(4)
    var tod: Option[java.time.LocalTime] = Some(after.toLocalTime)
    while (!day.isAfter(horizon)) {
      if (dayMatches(day.atStartOfDay())) {
        val floor = tod
        val hit = for {
          h <- hours.toSeq.sorted.find(h => floor.forall(_.getHour <= h))
          candidate <- bestInDay(h, floor)
        } yield candidate
        hit match {
          case Some(t) => return Some(day.atTime(t))
          case None => ()
        }
      }
      day = day.plusDays(1)
      tod = None
    }
    None
  }

  /** Smallest matching time-of-day at/after `floor` (None = start of
    * day), trying hours >= `fromHour`. */
  private def bestInDay(fromHour: Int, floor: Option[java.time.LocalTime])
      : Option[java.time.LocalTime] = {
    val hs = hours.toSeq.sorted.dropWhile(_ < fromHour)
    hs.iterator.flatMap { h =>
      val minFloor = floor match {
        case Some(f) if f.getHour == h => f.getMinute
        case _ => 0 // h > floor.hour by construction (hs starts at it)
      }
      minutes.toSeq.sorted.iterator.filter(_ >= minFloor).flatMap { m =>
        val secFloor = floor match {
          case Some(f) if f.getHour == h && f.getMinute == m => f.getSecond + 1
          case _ => 0
        }
        seconds.toSeq.sorted.find(_ >= secFloor)
          .map(s => java.time.LocalTime.of(h, m, s))
      }.take(1)
    }.take(1).toSeq.headOption
  }
}

object CronSchedule {

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val DayNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  private def parseField(raw: String, lo: Int, hi: Int,
                         names: Seq[String] = Nil, nameBase: Int = 1)
      : Set[Int] = {
    def atom(s: String): Int = {
      val i = names.indexWhere(_.equalsIgnoreCase(s))
      if (i >= 0) i + nameBase
      else {
        val v = s.toInt
        require(v >= lo && v <= hi, s"cron field value $v outside [$lo,$hi]")
        v
      }
    }
    raw.split(',').flatMap { part =>
      val up = part.toUpperCase
      require(!up.contains('#') && up != "L" && up != "W" && up != "LW" &&
          !up.matches(".*\\d[LW].*"),
        s"cron special '$part' (L/W/#) is not supported — use an " +
          "explicit day set")
      val (rangePart, step) = part.split('/') match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron part $part")
      }
      require(step >= 1, s"cron step must be >= 1: $part")
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains('-') =>
          val Array(a, b) = r.split('-'); (atom(a), atom(b))
        case single =>
          val v = atom(single)
          if (step == 1 && !part.contains('/')) (v, v) else (v, hi)
      }
      require(from <= to, s"inverted cron range $part")
      (from to to by step).toSeq
    }.toSet
  }

  /** Parse a Quartz cron expression; refuses loudly on anything it
    * cannot honor exactly. */
  def parse(expr: String): CronSchedule = {
    val f = expr.trim.split("\\s+")
    require(f.length == 6 || f.length == 7,
      s"cron expression needs 6 (or 7) fields 'sec min hour dom mon " +
        s"dow [year]': '$expr'")
    if (f.length == 7) require(f(6) == "*",
      s"year field must be '*' (got ${f(6)}): '$expr'")
    val dom = f(3) match {
      case "?" | "*" => None
      case other => Some(parseField(other, 1, 31))
    }
    val dow = f(5) match {
      case "?" | "*" => None
      case other => Some(parseField(other, 1, 7, DayNames))
    }
    CronSchedule(
      parseField(f(0), 0, 59),
      parseField(f(1), 0, 59),
      parseField(f(2), 0, 23),
      dom,
      parseField(f(4), 1, 12, MonthNames),
      dow,
      expr)
  }
}
