package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C57 — PPL (Piped Processing Language) runner. OpenSearch ships a
  * PPL plugin and its Observability UI speaks it; a user of the
  * reference stack queries the aggregated indexes with exactly this
  * pipe grammar. Supported core (the public PPL command set's head):
  *
  *   search source=<table> | where <expr> | eval <name> = <expr>
  *     | fields [+|-] f1, f2 | dedup f1 [, f2] | stats <aggs> [by f1, f2]
  *     | sort [+|-]f1 [, ...] | head N
  *     | top [N] f1[, f2] [by g1, g2] | rare [N] f1 [by g1]
  *     | parse <field> '<regex with (?<name>…) captures>'
  *     | eventstats <aggs> [by f1, f2] | fillnull with <value> in f1, f2
  *     | rename f1 as g1 [, f2 as g2]
  *
  * aggs: count(), sum(x), avg(x), min(x), max(x), dc(x) with
  * `as alias`; where/eval expressions: comparisons (= != > >= < <=),
  * and/or/not, parens, + - * /, numeric and 'quoted' literals.
  *
  * Design mirrors functions/QueryString: the pipeline parses ONCE on
  * the driver and compiles to the SAME DataFrame operators a
  * hand-written query would use — `where` becomes a pushable Column
  * predicate, `stats` a hash aggregate, `sort|head` the
  * TakeOrderedAndProject pattern. No run-time interpretation, no UDFs:
  * the DSL adds zero execution cost at any scale.
  */
object Ppl {

  // ---- expression parser (where/eval) --------------------------------

  private sealed trait ETok
  private case class Id(s: String) extends ETok
  private case class Num(s: String) extends ETok
  private case class Str(s: String) extends ETok
  private case class Op(s: String) extends ETok
  private case object ELp extends ETok
  private case object ERp extends ETok

  private def lexExpr(s: String): List[ETok] = {
    val out = scala.collection.mutable.ListBuffer.empty[ETok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += ELp; i += 1 }
      else if (c == ')') { out += ERp; i += 1 }
      else if (c == '\'' || c == '"') {
        val q = c; val sb = new StringBuilder; i += 1
        while (i < n && s.charAt(i) != q) { sb.append(s.charAt(i)); i += 1 }
        require(i < n, s"unterminated string literal in: $s")
        i += 1; out += Str(sb.toString)
      }
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val st = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        out += Num(s.substring(st, i))
      }
      else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Id(s.substring(st, i))
      }
      else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set(">=", "<=", "!=").contains(two)) { out += Op(two); i += 2 }
        else if ("=<>+-*/".indexOf(c) >= 0) { out += Op(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"bad character '$c' in: $s")
      }
    }
    out.toList
  }

  private final class EP(var t: List[ETok]) {
    private def peek = t.headOption
    private def eat(): ETok = { val h = t.head; t = t.tail; h }
    private def isKw(tok: ETok, w: String) = tok match {
      case Id(s) => s.equalsIgnoreCase(w); case _ => false
    }
    def orE(): Column = {
      var l = andE()
      while (peek.exists(isKw(_, "or"))) { eat(); l = l || andE() }
      l
    }
    private def andE(): Column = {
      var l = notE()
      while (peek.exists(isKw(_, "and"))) { eat(); l = l && notE() }
      l
    }
    private def notE(): Column =
      if (peek.exists(isKw(_, "not"))) { eat(); !notE() } else cmpE()
    private def cmpE(): Column = {
      val l = addE()
      peek match {
        case Some(Op(o)) if Set("=", "!=", ">", ">=", "<", "<=").contains(o) =>
          eat()
          val r = addE()
          o match {
            case "="  => l === r
            case "!=" => l =!= r
            case ">"  => l > r
            case ">=" => l >= r
            case "<"  => l < r
            case "<=" => l <= r
          }
        case _ => l
      }
    }
    private def addE(): Column = {
      var l = mulE()
      var go = true
      while (go) peek match {
        case Some(Op("+")) => eat(); l = l + mulE()
        case Some(Op("-")) => eat(); l = l - mulE()
        case _ => go = false
      }
      l
    }
    private def mulE(): Column = {
      var l = unary()
      var go = true
      while (go) peek match {
        case Some(Op("*")) => eat(); l = l * unary()
        case Some(Op("/")) => eat(); l = l / unary()
        case _ => go = false
      }
      l
    }
    private def unary(): Column = peek match {
      case Some(Op("-")) => eat(); -unary()
      case _ => primary()
    }
    private def primary(): Column = eat() match {
      case ELp => val e = orE(); require(peek.contains(ERp), "missing ')'"); eat(); e
      case Num(s) => if (s.contains('.')) lit(s.toDouble) else lit(s.toLong)
      case Str(s) => lit(s)
      case Id(s)  => col(s)
      case tok    => throw new IllegalArgumentException(s"unexpected $tok in expression")
    }
  }

  private[functions] def parseExpr(s: String): Column = {
    val p = new EP(lexExpr(s))
    val c = p.orE()
    require(p.t.isEmpty, s"trailing tokens in expression: $s")
    c
  }

  // ---- pipeline ------------------------------------------------------

  /** Split on top-level '|' (quotes respected). */
  private def stages(q: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    var quote: Char = 0
    q.foreach { c =>
      if (quote != 0) { sb.append(c); if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { quote = c; sb.append(c) }
      else if (c == '|') { out += sb.toString; sb.clear() }
      else sb.append(c)
    }
    out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toList
  }

  private val aggRe = "(?i)(count|sum|avg|min|max|dc)\\s*\\(\\s*([a-zA-Z_][a-zA-Z0-9_]*)?\\s*\\)(?:\\s+as\\s+([a-zA-Z_][a-zA-Z0-9_]*))?".r

  private def aggColumn(fn: String, arg: Option[String], alias: Option[String]): Column = {
    val c = fn.toLowerCase match {
      case "count" => count(lit(1))
      case "sum"   => sum(col(arg.getOrElse(sys.error("sum() needs a column"))))
      case "avg"   => avg(col(arg.getOrElse(sys.error("avg() needs a column"))))
      case "min"   => min(col(arg.getOrElse(sys.error("min() needs a column"))))
      case "max"   => max(col(arg.getOrElse(sys.error("max() needs a column"))))
      case "dc"    => countDistinct(col(arg.getOrElse(sys.error("dc() needs a column"))))
    }
    c.as(alias.getOrElse(fn.toLowerCase + arg.map("_" + _).getOrElse("")))
  }

  /** Run a PPL pipeline against the tables in `dir`. */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    val st = stages(query)
    require(st.nonEmpty, "empty PPL query")
    val head0 = st.head
    val srcRe = "(?i)^search\\s+source\\s*=\\s*([a-zA-Z_][a-zA-Z0-9_]*)$".r
    var df = head0.trim match {
      case srcRe(tbl) =>
        require(Tables.all.contains(tbl), s"unknown source table '$tbl'")
        if (tbl == "events") Tables.events(spark, dir) // ts nanos conversion
        else Tables.load(spark, dir, tbl)
      case other => throw new IllegalArgumentException(
        s"PPL must start with 'search source=<table>', got: $other")
    }
    st.tail.foreach { stage =>
      val (cmd, rest) = stage.span(!_.isWhitespace)
      val arg = rest.trim
      cmd.toLowerCase match {
        case "where" => df = df.filter(parseExpr(arg))
        case "eval" =>
          val i = arg.indexOf('=')
          require(i > 0, s"eval needs '<name> = <expr>', got: $arg")
          val name = arg.substring(0, i).trim
          df = df.withColumn(name, parseExpr(arg.substring(i + 1)))
        case "fields" =>
          val minus = arg.startsWith("-")
          val names = arg.stripPrefix("-").stripPrefix("+").split(',').map(_.trim)
          df = if (minus) df.drop(names.toIndexedSeq: _*)
               else df.select(names.map(col).toIndexedSeq: _*)
        case "dedup" =>
          df = df.dropDuplicates(arg.split(',').map(_.trim).toIndexedSeq)
        case "stats" =>
          val parts = arg.split("(?i)\\s+by\\s+")
          require(parts.length <= 2, s"stats: one 'by' clause allowed: $arg")
          val aggs = aggRe.findAllMatchIn(parts(0)).map(m =>
            aggColumn(m.group(1), Option(m.group(2)), Option(m.group(3)))).toSeq
          require(aggs.nonEmpty, s"stats: no aggregations in: $arg")
          df = if (parts.length == 2) {
            // `span(col, 1d|Nh|Nm)` in the by-list is PPL's
            // date_histogram: compiles to date_trunc/window-floor in
            // the same grouping projection — one map-side-combined
            // aggregate, exactly what the hand query gets
            val spanRe = "(?i)^span\\s*\\(\\s*([a-zA-Z_][a-zA-Z0-9_]*)\\s*,\\s*1([dhm])\\s*\\)$".r
            // top-level comma split: span(ts, 1d) carries its own comma
            val byParts = {
              val out = scala.collection.mutable.ListBuffer.empty[String]
              val sb = new StringBuilder
              var depth = 0
              parts(1).foreach { c =>
                if (c == '(') { depth += 1; sb.append(c) }
                else if (c == ')') { depth -= 1; sb.append(c) }
                else if (c == ',' && depth == 0) { out += sb.toString; sb.clear() }
                else sb.append(c)
              }
              out += sb.toString
              out.toSeq
            }
            val by = byParts.map(_.trim).map {
              case spanRe(f, unit) =>
                val u = unit.toLowerCase match {
                  case "d" => "day"; case "h" => "hour"; case "m" => "minute"
                }
                date_trunc(u, col(f)).as(s"span_$f")
              case s => col(s)
            }.toIndexedSeq
            df.groupBy(by: _*).agg(aggs.head, aggs.tail: _*)
          } else df.agg(aggs.head, aggs.tail: _*)
        case "sort" =>
          val keys = arg.split(',').map(_.trim).map { k =>
            if (k.startsWith("-")) col(k.drop(1).trim).desc
            else col(k.stripPrefix("+").trim).asc
          }
          df = df.orderBy(keys.toIndexedSeq: _*)
        case "head" =>
          df = df.limit(arg.trim.toInt)
        case "top" | "rare" =>
          // top [N] f1[, f2] [by g1, g2] — most/least frequent value
          // combos; compiles to ONE hash aggregate + (grouped) a
          // shard-parallel rank window / (global) a TakeOrdered limit.
          val byParts = arg.split("(?i)\\s+by\\s+")
          require(byParts.length <= 2, s"$cmd: one 'by' clause allowed: $arg")
          val lead = byParts(0).trim.split("\\s+", 2)
          val (n, fieldsStr) =
            if (lead(0).forall(_.isDigit) && lead.length == 2) (lead(0).toInt, lead(1))
            else (10, byParts(0).trim)
          val fields = fieldsStr.split(',').map(_.trim).toIndexedSeq
          val groups = if (byParts.length == 2)
            byParts(1).split(',').map(_.trim).toIndexedSeq else IndexedSeq.empty[String]
          val counted = df.groupBy((groups ++ fields).map(col): _*)
            .agg(count(lit(1)).as("count"))
          val cntOrd = if (cmd.equalsIgnoreCase("top")) col("count").desc else col("count").asc
          val tieOrd = fields.map(col(_).asc)
          df = if (groups.isEmpty) counted.orderBy(cntOrd +: tieOrd: _*).limit(n)
          else {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(groups.map(col): _*).orderBy(cntOrd +: tieOrd: _*)
            counted.withColumn("__r", row_number().over(w))
              .filter(col("__r") <= n).drop("__r")
          }
        case "eventstats" =>
          // eventstats: the window form of stats — metrics join every
          // row WITHOUT collapsing (PPL's "stats that keeps the
          // events"). Compiles to window aggregates partitioned by the
          // `by` keys: shard-parallel, no global sort — the exchange
          // is the same one `stats ... by` would pay. dc() runs as
          // size(collect_set(..)) since windows lack COUNT(DISTINCT);
          // state is bounded by per-group distinct cardinality.
          val parts = arg.split("(?i)\\s+by\\s+")
          require(parts.length <= 2, s"eventstats: one 'by' clause allowed: $arg")
          val w0 = org.apache.spark.sql.expressions.Window
          val w = if (parts.length == 2)
            w0.partitionBy(parts(1).split(',').map(s => col(s.trim)).toIndexedSeq: _*)
          else w0.partitionBy()
          val specs = aggRe.findAllMatchIn(parts(0)).map { m =>
            val (fn, fieldArg, alias) = (m.group(1), Option(m.group(2)), Option(m.group(3)))
            val c = fn.toLowerCase match {
              case "count" => count(lit(1)).over(w)
              case "sum"   => sum(col(fieldArg.getOrElse(sys.error("sum() needs a column")))).over(w)
              case "avg"   => avg(col(fieldArg.getOrElse(sys.error("avg() needs a column")))).over(w)
              case "min"   => min(col(fieldArg.getOrElse(sys.error("min() needs a column")))).over(w)
              case "max"   => max(col(fieldArg.getOrElse(sys.error("max() needs a column")))).over(w)
              case "dc"    => size(collect_set(col(fieldArg.getOrElse(sys.error("dc() needs a column")))).over(w)).cast("long")
            }
            (alias.getOrElse(fn.toLowerCase + fieldArg.map("_" + _).getOrElse("")), c)
          }.toSeq
          require(specs.nonEmpty, s"eventstats: no aggregations in: $arg")
          specs.foreach { case (name, c) => df = df.withColumn(name, c) }
        case "fillnull" =>
          // fillnull with <value> in f1, f2 — null repair before a
          // stats/join stage; pure coalesce projections, zero shuffle.
          val m = "(?i)^with\\s+(\\S+)\\s+in\\s+(.+)$".r.findFirstMatchIn(arg)
          require(m.isDefined, s"fillnull needs 'with <value> in <fields>', got: $arg")
          val raw = m.get.group(1)
          val value: Column =
            if (raw.head == '\'' || raw.head == '"') lit(raw.substring(1, raw.length - 1))
            else if (raw.contains('.')) lit(raw.toDouble) else lit(raw.toLong)
          m.get.group(2).split(',').map(_.trim).foreach { f =>
            df = df.withColumn(f, coalesce(col(f), value.cast(df.schema(f).dataType)))
          }
        case "rename" =>
          arg.split(',').map(_.trim).foreach { pair =>
            val p = pair.split("(?i)\\s+as\\s+")
            require(p.length == 2, s"rename needs '<old> as <new>', got: $pair")
            df = df.withColumnRenamed(p(0).trim, p(1).trim)
          }
        case "patterns" =>
          // patterns <field> [new_field=<name>] — PPL's log-grouping
          // command (simple_pattern mode): strip alphanumerics, keep
          // the punctuation/whitespace skeleton as the group key. One
          // codegen'd regexp_replace projection; the follow-on
          // `stats by patterns_field` is the C53 categorize shape.
          val sp = arg.split("\\s+").filter(_.nonEmpty)
          require(sp.nonEmpty, "patterns needs a field")
          val field = sp(0)
          val newField = sp.drop(1).collectFirst {
            case s if s.toLowerCase.startsWith("new_field=") =>
              s.substring("new_field=".length).stripPrefix("'").stripSuffix("'")
          }.getOrElse("patterns_field")
          df = df.withColumn(newField, regexp_replace(col(field), "[a-zA-Z0-9]", ""))
        case "parse" =>
          // parse <field> '<regex with (?<name>…) groups>' — named
          // captures become columns via codegen'd regexp_extract (the
          // group INDEX is what executes; the name is driver-side
          // sugar), exactly PPL's grok-lite semantics.
          val sp = arg.split("\\s+", 2)
          require(sp.length == 2, s"parse needs '<field> <pattern>', got: $arg")
          val field = sp(0).trim
          val raw = sp(1).trim
          require(raw.length >= 2 && (raw.head == '\'' || raw.head == '"') &&
            raw.last == raw.head, s"parse pattern must be quoted: $arg")
          val pattern = raw.substring(1, raw.length - 1)
          val named = "\\(\\?<([A-Za-z][A-Za-z0-9]*)>".r
            .findAllMatchIn(pattern).map(_.group(1)).toList
          require(named.nonEmpty, s"parse pattern has no (?<name>…) group: $arg")
          named.zipWithIndex.foreach { case (nm, i) =>
            df = df.withColumn(nm, regexp_extract(col(field), pattern, i + 1))
          }
        case other => throw new IllegalArgumentException(s"unknown PPL command '$other'")
      }
    }
    df
  }
}
