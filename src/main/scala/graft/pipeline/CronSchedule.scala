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
  * JAN..DEC and day names SUN..SAT (Quartz numbering: 1 = SUN), and
  * the calendar specials with Quartz semantics: `L` / `L-n` (last day
  * of month, offset), `LW` (last weekday), `nW` (nearest weekday to
  * day n, never crossing the month boundary), `dL` (last given
  * weekday of the month) and `d#n` (nth given weekday; a month with
  * no nth occurrence does not fire). A special must stand alone in
  * its field with `?`/`*` in the other, as in Quartz; specials inside
  * lists/ranges refuse loudly. When both day-of-month and day-of-week
  * are restricted, a date matching EITHER fires (classic-cron union;
  * Quartz itself refuses that combination). All evaluation is
  * driver-side wall-clock in the caller's zone — scheduling is
  * control-plane bookkeeping, never a data-plane concern. */
final case class CronSchedule(seconds: Set[Int], minutes: Set[Int],
                              hours: Set[Int], daysOfMonth: Option[Set[Int]],
                              months: Set[Int], daysOfWeek: Option[Set[Int]],
                              expr: String,
                              special: Option[CronSchedule.DaySpecial] = None) {

  private def dayMatches(t: LocalDateTime): Boolean = {
    if (!months.contains(t.getMonthValue)) return false
    // java DayOfWeek: MON=1..SUN=7 -> Quartz: SUN=1..SAT=7
    val quartzDow = t.getDayOfWeek.getValue % 7 + 1
    special match {
      case Some(sp) =>
        t.getDayOfMonth == CronSchedule.specialDom(sp, t.toLocalDate)
      case None => (daysOfMonth, daysOfWeek) match {
        case (None, None) => true
        case (Some(dom), None) => dom.contains(t.getDayOfMonth)
        case (None, Some(dow)) => dow.contains(quartzDow)
        case (Some(dom), Some(dow)) => // classic-cron union
          dom.contains(t.getDayOfMonth) || dow.contains(quartzDow)
      }
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

  /** The Quartz calendar-juggling day tokens (CronExpression's
    * L / W / # handling, surfaced through JobScheduler.java:595's
    * CronScheduleBuilder). Each resolves, per (year, month), to at most
    * one day of month. */
  sealed trait DaySpecial
  /** `L` / `L-n` in day-of-month: last day of the month, minus n. */
  final case class LastDayOfMonth(offset: Int) extends DaySpecial
  /** `LW` in day-of-month: last weekday (Mon-Fri) of the month. */
  case object LastWeekday extends DaySpecial
  /** `nW` in day-of-month: the weekday nearest day n, never leaving
    * the month (Sat -> preceding Fri, unless n=1 -> following Mon;
    * Sun -> following Mon, unless n = last day -> preceding Fri). */
  final case class NearestWeekday(day: Int) extends DaySpecial
  /** `dL` in day-of-week: the last d-weekday of the month (Quartz
    * numbering, 1 = SUN). */
  final case class LastDowOfMonth(dow: Int) extends DaySpecial
  /** `d#n` in day-of-week: the nth d-weekday of the month; months
    * without an nth occurrence do not fire. */
  final case class NthDowOfMonth(dow: Int, n: Int) extends DaySpecial

  /** The day-of-month `sp` resolves to in `date`'s month, or 0 (never
    * a valid dom) when the month has no such day. */
  private[pipeline] def specialDom(sp: DaySpecial,
                                   date: java.time.LocalDate): Int = {
    val last = date.lengthOfMonth
    def quartzDow(d: java.time.LocalDate) = d.getDayOfWeek.getValue % 7 + 1
    def weekdayNear(n: Int): Int = {
      val d = date.withDayOfMonth(math.min(n, last))
      d.getDayOfWeek match {
        case java.time.DayOfWeek.SATURDAY =>
          if (d.getDayOfMonth == 1) 3 else d.getDayOfMonth - 1
        case java.time.DayOfWeek.SUNDAY =>
          if (d.getDayOfMonth == last) last - 2 else d.getDayOfMonth + 1
        case _ => d.getDayOfMonth
      }
    }
    sp match {
      case LastDayOfMonth(off) => math.max(last - off, 0)
      case LastWeekday => weekdayNear(last)
      // Quartz: nW in a month with no day n does not fire at all
      // (CronExpression refuses to slide '31W' to a 30-day month's
      // last weekday), rather than clamping to the month length
      case NearestWeekday(n) => if (n > last) 0 else weekdayNear(n)
      case LastDowOfMonth(dow) =>
        (last to 1 by -1)
          .find(d => quartzDow(date.withDayOfMonth(d)) == dow).getOrElse(0)
      case NthDowOfMonth(dow, n) =>
        val hits = (1 to last)
          .filter(d => quartzDow(date.withDayOfMonth(d)) == dow)
        if (n <= hits.size) hits(n - 1) else 0
    }
  }

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
        s"cron special '$part' (L/W/#) must stand alone in its field " +
          "with '?' in the other day field, as in Quartz")
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

    val LOff = "L-(\\d{1,2})".r
    val NW = "(\\d{1,2})W".r
    val DowLast = "([A-Z]{3}|\\d)L".r
    val DowNth = "([A-Z]{3}|\\d)#(\\d)".r
    def free(field: String) = field == "?" || field == "*"
    def dowAtom(s: String): Int = {
      val i = DayNames.indexWhere(_.equalsIgnoreCase(s))
      val v = if (i >= 0) i + 1 else s.toInt
      require(v >= 1 && v <= 7, s"day-of-week value $v outside [1,7]")
      v
    }
    // a special owns its whole field and needs ?/* opposite — exactly
    // Quartz's rule; 'L' inside a list still refuses via parseField
    val domSpecial: Option[DaySpecial] = f(3).toUpperCase match {
      case "L" => Some(LastDayOfMonth(0))
      case LOff(n) =>
        require(n.toInt <= 30, s"L-${n} offset outside [0,30]")
        Some(LastDayOfMonth(n.toInt))
      case "LW" => Some(LastWeekday)
      case NW(n) =>
        require(n.toInt >= 1 && n.toInt <= 31, s"${n}W outside [1,31]")
        Some(NearestWeekday(n.toInt))
      case _ => None
    }
    val dowSpecial: Option[DaySpecial] = f(5).toUpperCase match {
      case DowLast(d) => Some(LastDowOfMonth(dowAtom(d)))
      case DowNth(d, n) =>
        require(n.toInt >= 1 && n.toInt <= 5, s"#$n outside [1,5]")
        Some(NthDowOfMonth(dowAtom(d), n.toInt))
      case _ => None
    }
    (domSpecial, dowSpecial) match {
      case (Some(_), _) => require(free(f(5)),
        s"day-of-month special '${f(3)}' needs '?' in day-of-week: '$expr'")
      case (_, Some(_)) => require(free(f(3)),
        s"day-of-week special '${f(5)}' needs '?' in day-of-month: '$expr'")
      case _ => ()
    }
    val special = domSpecial.orElse(dowSpecial)
    val dom = f(3) match {
      case _ if domSpecial.isDefined => None
      case "?" | "*" => None
      case other => Some(parseField(other, 1, 31))
    }
    val dow = f(5) match {
      case _ if dowSpecial.isDefined => None
      case "?" | "*" => None
      // bare 'L' in day-of-week "simply means 7 or SAT" (Quartz
      // CronExpression docs) — EVERY Saturday, not the month's last
      // (that is '7L'); only a trailing L after a day number means last
      case l if l.toUpperCase == "L" => Some(Set(7))
      case other => Some(parseField(other, 1, 7, DayNames))
    }
    CronSchedule(
      parseField(f(0), 0, 59),
      parseField(f(1), 0, 59),
      parseField(f(2), 0, 23),
      dom,
      parseField(f(4), 1, 12, MonthNames),
      dow,
      expr,
      special)
  }
}
