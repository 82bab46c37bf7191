package graft.sql

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.model.Meta
import graft.operators.GraftTable

/** Session extension making the graft SQL surface FIRST-CLASS in bare
  * `spark.sql(...)` — no `GraftSql.sql` doorway needed. Install with
  * `spark.sql.extensions=graft.sql.GraftSparkExtension` at session build
  * time (the Verify/Bench/Main sessions all do). Two statement classes
  * are intercepted by an injected parser; EVERYTHING else — including
  * every statement that merely CONTAINS these phrases inside a string
  * literal — parses through Spark's own parser verbatim:
  *
  *  - `CALL <proc>(...)` — whole-statement match, dispatched to the
  *    procedure surface ([[GraftSql.call]]). SHOW-style procedures stay
  *    lazy plans; mutations execute eagerly like Spark's own commands.
  *  - `MERGE INTO graft.<t> ...` — parsed by SPARK'S parser into its
  *    `MergeIntoTable` AST first (never by regex over query text), then
  *    translated by [[GraftMergeSql]] onto the engine's three-way
  *    expression merge ([[GraftTable.mergeInto]]), preserving its
  *    guarantees (duplicate-source-key rejection, manifest-pruned
  *    rewrite, OCC retry). A MERGE whose target is NOT in the graft
  *    catalog passes through untouched.
  *
  * `INSERT INTO graft.<t>` needs no parser help — it resolves through
  * the catalog's DSv2 write path (`GraftV2Table` SupportsWrite).
  */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
}

/** Delegating parser: intercepts `CALL` (whole-statement, the same
  * quote-aware grammar as the doorway) and graft-targeted MERGE; every
  * other method and statement is the delegate's verbatim. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case GraftSql.CallRe(proc, args) =>
      val p = proc.toLowerCase
      GraftSql.call(session, p,
        GraftSql.parseArgs(args, GraftSql.freeFormArg(p)))
        .queryExecution.logical
    case _ =>
      val plan = delegate.parsePlan(sqlText)
      GraftMergeSql.rewrite(session, plan)
        .orElse(GraftRowLevelSql.rewrite(session, plan))
        .getOrElse(plan)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** SQL `MERGE INTO graft.<t>` → [[GraftTable.mergeInto]] translation.
  *
  * The statement arrives as Spark's own parsed `MergeIntoTable` AST; the
  * translator maps the supported — and loudly rejects the unsupported —
  * shapes onto the API's semantics:
  *
  *  - `ON` must equate the record key column(s) between target and
  *    source (the engine's MERGE identity is the record key; arbitrary
  *    join conditions have no meaning against a keyed table).
  *  - any number of `WHEN MATCHED [AND cond] THEN UPDATE/DELETE`
  *    clauses with FIRST-MATCH-WINS ordering (the Delta/Hudi contract):
  *    each clause's effective condition is `cond AND NOT (any earlier
  *    cond)` — mutually exclusive by construction — and updates compile
  *    to one per-column CASE chain over the clauses in statement order;
  *  - any number of `WHEN NOT MATCHED [AND cond] THEN INSERT *` (or an
  *    explicit identity column list) clauses — the engine inserts the
  *    full source row identically whichever clause fires, so
  *    first-match-wins collapses to inserting where ANY condition holds;
  *  - any number of `WHEN NOT MATCHED BY SOURCE [AND cond] THEN
  *    UPDATE/DELETE` clauses, first-match-wins — these quantify over
  *    every target row, so the engine merge runs unpruned (full-table
  *    rewrite, the honest cost of the semantics);
  *  - `MERGE WITH SCHEMA EVOLUTION INTO`: the table schema widens to
  *    the union with the source's (new columns append, same-name types
  *    promote — upsert's widen-only lattice); `UPDATE SET *` / identity
  *    INSERT then cover every source column, new ones included.
  *
  * Attribute references in action expressions are re-homed onto the
  * engine's merge frame: source-qualified columns become their
  * `src_`-prefixed join aliases, target-qualified (and unqualified
  * target-resolvable) columns stay plain.
  */
private[sql] object GraftMergeSql {

  /** Execute `plan` through the engine if it is a MERGE targeting a
    * registered graft-catalog table; None = not ours. */
  def rewrite(spark: SparkSession, plan: LogicalPlan): Option[LogicalPlan] =
    plan match {
      case m: MergeIntoTable =>
        graftTarget(m.targetTable).map { case (name, alias) =>
          run(spark, m, name, alias)
        }
      case _ => None
    }

  /** (registered table name, optional alias) when `p` is
    * `graft.<name>` (with optional SubqueryAlias wrapper). */
  private[sql] def graftTarget(p: LogicalPlan): Option[(String, Option[String])] =
    p match {
      case SubqueryAlias(id, child) =>
        graftTarget(child).map { case (n, _) => (n, Some(id.name)) }
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
        Some((u.multipartIdentifier(1), None))
      case _ => None
    }

  private def sourceAliases(p: LogicalPlan): Set[String] = p match {
    case SubqueryAlias(id, _) => Set(id.name.toLowerCase)
    case u: UnresolvedRelation => Set(u.multipartIdentifier.last.toLowerCase)
    case _ => Set.empty
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft MERGE INTO: $msg")

  private def run(spark: SparkSession, m: MergeIntoTable, name: String,
      targetAlias: Option[String]): LogicalPlan = {
    val MergeIntoTable(_, sourcePlan, cond, matched, notMatched,
      notMatchedBySource, withSchemaEvolution) = m
    val table = GraftSql.lookupRegistered(name).getOrElse(fail(
      s"$name is not a registered graft table (GraftSql.register first)"))
    val sourceDf: DataFrame = GraftSqlBridge.ofRows(spark, sourcePlan)
    val srcCols = sourceDf.columns.map(_.toLowerCase).toSet
    val tblCols = table.readUser().columns.map(_.toLowerCase).toSet
    val tAliases: Set[String] =
      targetAlias.map(_.toLowerCase).toSet + name.toLowerCase
    val sAliases = sourceAliases(sourcePlan)

    // which side an attribute's qualifier names: Some(true)=source,
    // Some(false)=target, None=unqualified/unknown
    def side(ua: UnresolvedAttribute): Option[Boolean] =
      if (ua.nameParts.length < 2) None
      else {
        val tail = ua.nameParts.init.last.toLowerCase
        if (sAliases.contains(tail)) Some(true)
        else if (tAliases.contains(tail)) Some(false)
        else fail(s"unknown qualifier in ${ua.nameParts.mkString(".")} " +
          s"(target: ${tAliases.mkString("/")}, source: ${sAliases.mkString("/")})")
      }

    // ---- ON must equate the record key between the two sides ---------
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val keySet = table.keyFields.map(_.toLowerCase).toSet
    val covered = conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) &&
            keySet(a.nameParts.last.toLowerCase) &&
            !(side(a).isDefined && side(a) == side(b)) =>
        a.nameParts.last.toLowerCase
      case other => fail("ON must equate the record key column(s) " +
        s"(${table.keyFields.mkString(", ")}) between target and source; " +
        s"unsupported conjunct: ${other.sql}")
    }
    if (covered.toSet != keySet || covered.size != keySet.size)
      fail(s"ON must cover exactly the record key (${table.keyFields.mkString(", ")}); " +
        s"got: ${covered.mkString(", ")}")

    // ---- action-expression translation onto the merge frame ----------
    def xlate(e: Expression): Column = GraftSqlBridge.column(e.transformUp {
      case ua: UnresolvedAttribute =>
        val nm = ua.nameParts.last
        side(ua) match {
          case Some(true) => UnresolvedAttribute(Seq("src_" + nm))
          case Some(false) => UnresolvedAttribute(Seq(nm))
          case None =>
            if (tblCols(nm.toLowerCase)) UnresolvedAttribute(Seq(nm))
            else if (srcCols(nm.toLowerCase)) UnresolvedAttribute(Seq("src_" + nm))
            else fail(s"column $nm exists in neither target nor source")
        }
    })

    def assignName(a: Assignment): String = a.key match {
      case ua: UnresolvedAttribute if side(ua) != Some(true) => ua.nameParts.last
      case other => fail(s"assignment target must be a target column: ${other.sql}")
    }
    // UPDATE SET * / identity-insert expansion: shared non-meta columns —
    // under WITH SCHEMA EVOLUTION every source column participates (new
    // ones widen the table schema engine-side)
    val shared = (if (withSchemaEvolution) srcCols else srcCols & tblCols) -
      Meta.RecordKey.toLowerCase - Meta.CommitSeq.toLowerCase
    def starSet: Seq[(String, Column)] =
      (shared -- keySet).toSeq.sorted.map(c => c -> col("src_" + c))

    // ---- matched actions: N UPDATE/DELETE clauses, FIRST-MATCH-WINS —
    // the Delta/Hudi contract. Clause i fires where its condition holds
    // AND no earlier clause's condition did, which makes the effective
    // conditions mutually exclusive by construction: the engine's
    // delete-vs-update apply order cannot matter, every matched row is
    // claimed by at most one clause, and rows no clause claims carry
    // over unchanged. NULL conditions count as non-matching (coalesce
    // to false), per SQL's WHEN semantics.
    var prior: Column = lit(false)
    var deleteCond: Option[Column] = None
    val updateClauses = Seq.newBuilder[(Column, Map[String, Column])]
    def rawCond(c0: Option[Expression]): Column =
      c0.map(e => coalesce(xlate(e), lit(false))).getOrElse(lit(true))
    def addClause(c0: Option[Expression],
        assigns: Option[Seq[(String, Column)]]): Unit = {
      val raw = rawCond(c0)
      val eff = raw && !prior
      assigns match {
        case Some(set) => updateClauses += ((eff, set.toMap))
        case None => deleteCond = Some(deleteCond.fold(eff)(_ || eff))
      }
      prior = prior || raw
    }
    matched.foreach {
      case DeleteAction(c0) => addClause(c0, None)
      case UpdateAction(c0, assigns, _) =>
        addClause(c0, Some(assigns.map(a => assignName(a) -> xlate(a.value))))
      case UpdateStarAction(c0) => addClause(c0, Some(starSet))
      case other => fail(s"unsupported WHEN MATCHED action: $other")
    }
    // per column: one CASE chain in clause order; a clause that does not
    // assign the column keeps the target value for the rows it claims —
    // which is NULL for an evolution-added column (the target never had
    // a value there, and the frame has no such column to reference)
    def targetValueOf(n: String): Column =
      if (tblCols(n.toLowerCase)) col(n) else lit(null)
    val updateClauseList = updateClauses.result()
    val updateSet: Map[String, Column] =
      updateClauseList.flatMap(_._2.keys).distinct.map { n =>
        n -> updateClauseList.foldRight(targetValueOf(n)) { case ((eff, set), acc) =>
          when(eff, set.getOrElse(n, targetValueOf(n))).otherwise(acc)
        }
      }.toMap
    // which matched rows the clauses CLAIM: only those take the new
    // commit stamp — a matched row every clause passed over is an
    // unmodified carry and keeps its own (delete-claimed rows are
    // removed before stamping, so the update claims suffice)
    val matchedTouched: Option[Column] =
      Some(updateClauseList.map(_._1).reduceOption(_ || _)
        .getOrElse(lit(false)))

    // ---- not-matched: N INSERT clauses (star / identity column list),
    // each optionally conditional. The engine inserts the full source
    // row identically whichever clause fires, so first-match-wins
    // collapses to "insert where ANY clause condition holds".
    def checkIdentity(assigns: Seq[Assignment]): Unit = {
      val named = assigns.map { a =>
        val n = assignName(a)
        a.value match {
          case v: UnresolvedAttribute
              if v.nameParts.last.equalsIgnoreCase(n) && side(v) != Some(false) => n.toLowerCase
          case other => fail("INSERT must be identity (col <- source.col); " +
            s"got ${other.sql} — the engine inserts the full source row")
        }
      }
      if (named.toSet != shared)
        fail(s"INSERT column list must cover every shared column (${shared.toSeq.sorted.mkString(", ")})")
    }
    // a clause family that quantifies over rows missing one side must
    // not reference that side — those columns are NULL on every row the
    // clause can fire on, so the condition would silently never hold;
    // refuse loudly instead (the Delta/Spark contract)
    def forbidSide(e: Expression, srcSide: Boolean, ctx: String): Unit =
      e.foreach {
        case ua: UnresolvedAttribute if side(ua) == Some(srcSide) =>
          fail(s"$ctx may not reference ${if (srcSide) "source" else "target"} " +
            s"columns: ${ua.nameParts.mkString(".")}")
        case _ => ()
      }
    val insertConds: Seq[Option[Expression]] = notMatched.map {
      case InsertStarAction(c0) => c0
      case InsertAction(c0, assigns) => checkIdentity(assigns); c0
      case other => fail(s"unsupported WHEN NOT MATCHED action: $other")
    }
    insertConds.flatten.foreach(
      forbidSide(_, srcSide = false, "WHEN NOT MATCHED condition"))
    val insert = insertConds.nonEmpty
    val insertCond: Option[Column] =
      if (insertConds.isEmpty || insertConds.exists(_.isEmpty)) None
      else Some(insertConds.flatten
        .map(e => coalesce(xlate(e), lit(false))).reduce(_ || _))

    // ---- not-matched-by-source: N UPDATE/DELETE clauses over target
    // rows with no source key — same first-match-wins compilation as
    // the matched family (source-side refs are NULL on these rows, so a
    // condition touching them simply never fires — SQL WHEN semantics)
    var bsPrior: Column = lit(false)
    var bsDeleteCond: Option[Column] = None
    val bsUpdateClauses = Seq.newBuilder[(Column, Map[String, Column])]
    notMatchedBySource.foreach {
      case DeleteAction(c0) =>
        c0.foreach(forbidSide(_, srcSide = true,
          "WHEN NOT MATCHED BY SOURCE condition"))
        val raw = rawCond(c0)
        val eff = raw && !bsPrior
        bsDeleteCond = Some(bsDeleteCond.fold(eff)(_ || eff))
        bsPrior = bsPrior || raw
      case UpdateAction(c0, assigns, _) =>
        c0.foreach(forbidSide(_, srcSide = true,
          "WHEN NOT MATCHED BY SOURCE condition"))
        assigns.foreach(a => forbidSide(a.value, srcSide = true,
          "WHEN NOT MATCHED BY SOURCE assignment"))
        val raw = rawCond(c0)
        bsUpdateClauses += ((raw && !bsPrior,
          assigns.map(a => assignName(a) -> xlate(a.value)).toMap))
        bsPrior = bsPrior || raw
      case other => fail(s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
    val bsClauses = bsUpdateClauses.result()
    val bsSet: Map[String, Column] =
      bsClauses.flatMap(_._2.keys).distinct.map { n =>
        n -> bsClauses.foldRight(targetValueOf(n)) { case ((eff, set), acc) =>
          when(eff, set.getOrElse(n, targetValueOf(n))).otherwise(acc)
        }
      }.toMap
    val bsTouched: Option[Column] =
      if (bsClauses.isEmpty) None
      else Some(bsClauses.map(_._1).reduce(_ || _))

    val commit = table.mergeInto(sourceDf,
      whenMatchedSet = updateSet,
      whenMatchedDelete = deleteCond,
      insertWhenNotMatched = insert,
      insertWhenNotMatchedCond = insertCond,
      whenNotMatchedBySourceSet = bsSet,
      whenNotMatchedBySourceDelete = bsDeleteCond,
      whenNotMatchedBySourceTouched = bsTouched,
      whenMatchedTouched = matchedTouched,
      evolveSchema = withSchemaEvolution)
    summaryDf(spark, Seq(
      "seq" -> commit.seq.toString,
      "action" -> commit.action,
      "files_rewritten" -> commit.extra.getOrElse("files_rewritten", "0"),
      "files_carried" -> commit.extra.getOrElse("files_carried", "0"),
      "rows_written" -> commit.extra.getOrElse("rows_written", "0")))
      .queryExecution.logical
  }

  private def summaryDf(spark: SparkSession, rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "value")
  }
}

/** SQL `UPDATE graft.<t> SET ... [WHERE ...]` and
  * `DELETE FROM graft.<t> [WHERE ...]` → the engine's pruned partial
  * rewrites ([[GraftTable.updateWhere]]/[[GraftTable.deleteRows]]).
  *
  * The statement arrives as Spark's own parsed `UpdateTable` /
  * `DeleteFromTable` AST. The WHERE expression is applied EXACTLY (it
  * becomes the rewrite's row filter); independently, its translatable
  * conjuncts (comparisons/IN between a column and a literal) are
  * extracted as source filters for the MANIFEST TRIAGE, so a predicate
  * on the key, a tracked stats column, a bloom column, or a partition
  * column rewrites only the files that can hold matching rows.
  * Untranslatable predicates just rewrite more files — never wrong
  * results. Non-graft targets pass through to Spark untouched.
  */
private[sql] object GraftRowLevelSql {
  import org.apache.spark.sql.catalyst.CatalystTypeConverters
  import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, In => CatalystIn, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or}
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, UpdateTable}
  import org.apache.spark.sql.{sources => sf}

  def rewrite(spark: SparkSession, plan: LogicalPlan): Option[LogicalPlan] =
    plan match {
      case UpdateTable(target, assignments, condition) =>
        GraftMergeSql.graftTarget(target).map { case (name, alias) =>
          runUpdate(spark, name, alias, assignments, condition)
        }
      case DeleteFromTable(target, condition) =>
        GraftMergeSql.graftTarget(target).map { case (name, alias) =>
          runDelete(spark, name, alias, condition)
        }
      case _ => None
    }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft row-level SQL: $msg")

  private def table(name: String): GraftTable =
    GraftSql.lookupRegistered(name).getOrElse(fail(
      s"$name is not a registered graft table (GraftSql.register first)"))

  /** Strip target-alias qualifiers; reject foreign ones (a single-
    * relation statement has no other scope to resolve against). */
  private def xlate(e: Expression, aliases: Set[String]): Column =
    GraftSqlBridge.column(e.transformUp {
      case ua: UnresolvedAttribute if ua.nameParts.length >= 2 =>
        val tail = ua.nameParts.init.last.toLowerCase
        if (aliases(tail)) UnresolvedAttribute(Seq(ua.nameParts.last))
        else fail(s"unknown qualifier in ${ua.nameParts.mkString(".")}")
    })

  /** Translatable conjuncts of the WHERE expression as source filters
    * for the manifest triage — conservative: anything unrecognized
    * contributes nothing. */
  private[sql] def triageFilters(e: Expression, aliases: Set[String]): Seq[sf.Filter] = {
    def attr(x: Expression): Option[String] = x match {
      case ua: UnresolvedAttribute
          if ua.nameParts.length == 1 ||
            aliases(ua.nameParts.init.last.toLowerCase) =>
        Some(ua.nameParts.last)
      case _ => None
    }
    def value(x: Expression): Option[Any] = x match {
      case l: Literal if l.value != null =>
        Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    def conj(x: Expression): Seq[sf.Filter] = x match {
      case And(a, b) => conj(a) ++ conj(b)
      case EqualTo(a, v) =>
        (for { n <- attr(a); w <- value(v) } yield sf.EqualTo(n, w)).toSeq ++
          (for { n <- attr(v); w <- value(a) } yield sf.EqualTo(n, w)).toSeq
      case GreaterThan(a, v) =>
        (for { n <- attr(a); w <- value(v) } yield sf.GreaterThan(n, w)).toSeq ++
          (for { n <- attr(v); w <- value(a) } yield sf.LessThan(n, w)).toSeq
      case GreaterThanOrEqual(a, v) =>
        (for { n <- attr(a); w <- value(v) } yield sf.GreaterThanOrEqual(n, w)).toSeq ++
          (for { n <- attr(v); w <- value(a) } yield sf.LessThanOrEqual(n, w)).toSeq
      case LessThan(a, v) =>
        (for { n <- attr(a); w <- value(v) } yield sf.LessThan(n, w)).toSeq ++
          (for { n <- attr(v); w <- value(a) } yield sf.GreaterThan(n, w)).toSeq
      case LessThanOrEqual(a, v) =>
        (for { n <- attr(a); w <- value(v) } yield sf.LessThanOrEqual(n, w)).toSeq ++
          (for { n <- attr(v); w <- value(a) } yield sf.GreaterThanOrEqual(n, w)).toSeq
      case CatalystIn(a, vs) if vs.nonEmpty =>
        (for {
          n <- attr(a)
          ws <- Some(vs.map(value)) if ws.forall(_.isDefined)
        } yield sf.In(n, ws.flatten.toArray)).toSeq
      case _: Or | _: Not | _: IsNull | _: IsNotNull => Seq.empty
      case _ => Seq.empty
    }
    conj(e)
  }

  private def aliasSet(name: String, alias: Option[String]): Set[String] =
    alias.map(_.toLowerCase).toSet + name.toLowerCase

  private def runUpdate(spark: SparkSession, name: String,
      alias: Option[String], assignments: Seq[Assignment],
      condition: Option[Expression]): LogicalPlan = {
    val t = table(name)
    val aliases = aliasSet(name, alias)
    val set = assignments.map { a =>
      a.key match {
        case ua: UnresolvedAttribute
            if ua.nameParts.length == 1 ||
              aliases(ua.nameParts.init.last.toLowerCase) =>
          ua.nameParts.last -> xlate(a.value, aliases)
        case other => fail(s"assignment target must be a table column: ${other.sql}")
      }
    }.toMap
    val cond = condition.map(xlate(_, aliases))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val filters = condition.map(triageFilters(_, aliases)).getOrElse(Seq.empty)
    val c = t.updateWhere(set, cond, filters)
    summary(spark, c)
  }

  private def runDelete(spark: SparkSession, name: String,
      alias: Option[String], condition: Expression): LogicalPlan = {
    val t = table(name)
    val aliases = aliasSet(name, alias)
    val c = t.deleteRows(xlate(condition, aliases),
      triageFilters(condition, aliases))
    summary(spark, c)
  }

  private def summary(spark: SparkSession, c: graft.model.Commit): LogicalPlan = {
    import spark.implicits._
    Seq("seq" -> c.seq.toString, "action" -> c.action,
      "files_rewritten" -> c.extra.getOrElse("files_rewritten", "0"),
      "files_carried" -> c.extra.getOrElse("files_carried", "0"),
      "rows_written" -> c.extra.getOrElse("rows_written", "0"))
      .toDF("key", "value").queryExecution.logical
  }
}
