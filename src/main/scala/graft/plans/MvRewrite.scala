package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Repartition, RepartitionByExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view QUERY REWRITE: an optimizer rule that substitutes
  * a registered aggregate view for the aggregation it answers — the
  * classic warehouse MV substitution (exact-match scope), sitting on
  * top of the incremental-maintenance layer ([[Ivm]] keeps such views
  * current; this rule makes readers USE them without changing their
  * queries).
  *
  * Matching is deliberately conservative — a rewrite must NEVER change
  * results, and a shared session runs many queries:
  *  - the child must be a bare parquet scan of the registered base
  *    path (seen through column-pruning Projects and repartitions —
  *    no filters: a filtered aggregate is NOT answerable by a
  *    group-level view),
  *  - groupings must equal the view's group columns as a set,
  *  - the query's aggregate list must match the view's aggregate set
  *    EXACTLY (same functions on same inputs, all of them) — subset
  *    matching would silently re-route unrelated queries that happen
  *    to share a prefix, changing measured plans session-wide.
  *
  * The replacement projects the view's columns under the ORIGINAL
  * output attribute ids (exprId-pinned aliases), so downstream
  * operators resolve untouched; originally non-nullable outputs (the
  * grouping key, counts) are re-asserted with KnownNotNull since a
  * parquet scan's attributes come back nullable.
  *
  * Scale: this is the 100 TB aggregation answer — the full-scan
  * group-by runs ONCE (and stays current via [[Ivm]]'s delta
  * maintenance); every matching query afterwards reads |groups| rows.
  */
object MvRewrite {

  /** Aggregate spec: (function, input column or "*", view column).
    * For a GOVERNED base table (`basePath = graft://root/ns/t`, built
    * by [[graftPath]]), `baseVersion` records the snapshot the view
    * was computed from: governed tables mutate mid-session, so the
    * rule re-reads the current version at match time and DECLINES the
    * rewrite when the base moved — stale views must never answer
    * (freshness gate; parquet bases are immutable files and skip it).
    */
  final case class MvDef(name: String, basePath: String,
      groupCols: Seq[String], aggs: Seq[(String, String, String)],
      mvPath: String, baseVersion: Option[Long] = None)

  /** basePath form for a governed table. */
  def graftPath(root: String, ns: String, t: String): String =
    s"graft://$root/$ns/$t"

  private val defs = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()
  @volatile private var installed = false

  def register(spark: SparkSession, d: MvDef): Unit = {
    defs.put(d.name, d)
    install(spark)
  }

  /** Test hook: forget every view (the rule becomes a no-op). */
  def clear(): Unit = defs.clear()

  /** Test seam: runs between [[refresh]]'s version pin and its
    * recompute write — exactly where a racing DML commit would land.
    * Production no-op; MvRewriteSpec injects an INSERT here to prove
    * the pin-before-scan ordering always declines a possibly-stale
    * view (the race can only make the rule conservative, never serve
    * stale data).
    */
  private[graft] var refreshRaceHook: () => Unit = () => ()

  /** Recompute a registered view from its base and re-pin its
    * version (the `CALL g.system.refresh_mv(name)` action). The
    * version is read BEFORE the recompute scan: if DML races the
    * refresh, the pin is older than the data, so the rule declines —
    * never the unsafe direction. Returns the pinned version (-1 for
    * immutable parquet bases, which need no pin).
    */
  def refresh(spark: SparkSession, name: String): Long = {
    import org.apache.spark.sql.functions._
    val d = Option(defs.get(name)).getOrElse(throw
      new IllegalArgumentException(s"unknown materialized view: $name"))
    val (base, pin) =
      if (d.basePath.startsWith("graft://")) {
        val parts = d.basePath.stripPrefix("graft://").split('/')
        val t = parts.last
        val ns = parts(parts.length - 2)
        val root = parts.dropRight(2).mkString("/")
        val v = TableIO.currentVersion(root, ns, t)
        (Mor.read(spark, root, ns, t), Some(v))
      } else (spark.read.parquet(d.basePath), None)
    refreshRaceHook()
    val aggCols = d.aggs.map {
      case ("count", "*", out) => count(lit(1)).as(out)
      case ("count", c, out) => count(col(c)).as(out)
      case ("sum", c, out) => sum(col(c)).as(out)
      case ("min", c, out) => min(col(c)).as(out)
      case ("max", c, out) => max(col(c)).as(out)
      case (fn, _, _) => throw new IllegalArgumentException(
        s"unsupported MV aggregate: $fn")
    }
    base.groupBy(d.groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .write.mode("overwrite").parquet(d.mvPath)
    defs.put(name, d.copy(baseVersion = pin))
    pin.getOrElse(-1L)
  }

  /** The base path a DataFrame scans — what [[MvDef.basePath]] must
    * hold for the rewrite to recognize queries over that frame.
    */
  def pathOf(df: org.apache.spark.sql.DataFrame): Option[String] =
    scanPath(df.queryExecution.analyzed)

  def install(spark: SparkSession): Unit = synchronized {
    if (!installed) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RewriteRule(spark)
      installed = true
    }
  }

  /** The scan's root path when the plan is a parquet relation seen
    * through pruning projects / repartitions; None otherwise.
    */
  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case RepartitionByExpression(_, child, _, _) => scanPath(child)
    case Repartition(_, _, child) => scanPath(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption.map(_.toString)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: GraftSqlTable => Some(graftPath(t.root, t.ns, t.t))
        case _ => None
      }
    case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      scanPath(s.relation)
    case _ => None
  }

  /** Governed-base freshness: true when the def has no version pin
    * (immutable parquet base) or the base is still AT the pinned
    * version.
    */
  private def fresh(d: MvDef): Boolean = d.baseVersion match {
    case None => true
    case Some(v) =>
      d.basePath.stripPrefix("graft://").split('/') match {
        case parts if parts.length >= 3 =>
          val t = parts.last
          val ns = parts(parts.length - 2)
          val root = parts.dropRight(2).mkString("/")
          scala.util.Try(TableIO.currentVersion(root, ns, t))
            .toOption.contains(v)
        case _ => false
      }
  }

  /** (function name, input column) of a supported aggregate call. */
  private def aggKey(e: AggregateExpression): Option[(String, String)] =
    if (e.isDistinct || e.filter.nonEmpty || e.mode != Complete) None
    else e.aggregateFunction match {
      case Sum(a: AttributeReference, _) => Some(("sum", a.name))
      case Min(a: AttributeReference) => Some(("min", a.name))
      case Max(a: AttributeReference) => Some(("max", a.name))
      // COUNT(NULL) must return 0, not the view's row count — only a
      // non-null literal is count(*)-equivalent
      case Count(Seq(Literal(v, _))) if v != null => Some(("count", "*"))
      case Count(Seq(a: AttributeReference)) => Some(("count", a.name))
      case _ => None
    }

  class RewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (defs.isEmpty) plan
      else plan.transform {
        case agg: Aggregate =>
          rewriteFor(agg, agg.groupingExpressions, agg.aggregateExpressions,
            agg.child).getOrElse(agg)
      }

    private def rewriteFor(agg: Aggregate, groupings: Seq[_],
        aggExprs: Seq[NamedExpression],
        child: LogicalPlan): Option[LogicalPlan] = {
      val path = scanPath(child).getOrElse(return None)
      val groupNames = groupings.collect {
        case a: AttributeReference => a.name
      }
      if (groupNames.size != groupings.size) return None
      // each output: a grouping column, or an aliased supported agg
      val outSpecs: Seq[Either[String, (String, String, String)]] =
        aggExprs.map {
          case a: AttributeReference if groupNames.contains(a.name) =>
            Left(a.name)
          case al @ Alias(ae: AggregateExpression, _) =>
            aggKey(ae) match {
              case Some((fn, in)) => Right((fn, in, al.name))
              case None => return None
            }
          case _ => return None
        }
      val queryAggs = outSpecs.collect { case Right((fn, in, _)) => (fn, in) }
      import scala.jdk.CollectionConverters._
      val candidates = defs.values.asScala.filter { d =>
        d.basePath == path && fresh(d) &&
          // exact grouping, or a COARSER one the view rolls up to —
          // only for re-aggregable functions (count/min/max; float
          // sums would re-associate, changing bits)
          (d.groupCols.toSet == groupNames.toSet ||
            (groupNames.toSet.subsetOf(d.groupCols.toSet) &&
              queryAggs.forall(a => Set("count", "min", "max")(a._1)))) &&
          // EXACT aggregate-set match (see scaladoc)
          d.aggs.map(t => (t._1, t._2)).toSet == queryAggs.toSet &&
          d.aggs.size == queryAggs.size
      }
      // prefer an exact-grain view over a roll-up (cheaper: no
      // re-aggregation at read time)
      val d = candidates.find(_.groupCols.toSet == groupNames.toSet)
        .orElse(candidates.headOption).getOrElse(return None)
      val mvColFor: Map[(String, String), String] =
        d.aggs.map(t => (t._1, t._2) -> t._3).toMap
      val mvPlan = spark.read.parquet(d.mvPath)
        .queryExecution.analyzed
      val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      if (d.groupCols.toSet == groupNames.toSet) {
        val projections = aggExprs.zip(outSpecs).map { case (orig, spec) =>
          val src = spec match {
            case Left(g) => mvAttr.getOrElse(g, return None)
            case Right((fn, in, _)) =>
              mvAttr.getOrElse(mvColFor((fn, in)), return None)
          }
          if (src.dataType != orig.dataType) return None
          val e = if (orig.nullable) src else KnownNotNull(src)
          Alias(e, orig.name)(exprId = orig.exprId)
        }
        Some(Project(projections, mvPlan))
      } else {
        // ROLL-UP: re-aggregate the view at the query's coarser
        // grouping — count becomes sum-of-counts, min/max fold again.
        val newGroupings = groupNames.map(g => mvAttr.getOrElse(g, return None))
        val newAggs: Seq[NamedExpression] =
          aggExprs.zip(outSpecs).map { case (orig, spec) =>
            spec match {
              case Left(g) =>
                val src = mvAttr.getOrElse(g, return None)
                if (src.dataType != orig.dataType) return None
                val e = if (orig.nullable) src else KnownNotNull(src)
                Alias(e, orig.name)(exprId = orig.exprId)
              case Right((fn, in, _)) =>
                val src = mvAttr.getOrElse(mvColFor((fn, in)), return None)
                val refold = fn match {
                  case "count" => Sum(src)
                  case "min" => Min(src)
                  case "max" => Max(src)
                  case _ => return None
                }
                val call = AggregateExpression(refold, Complete,
                  isDistinct = false)
                if (call.dataType != orig.dataType) return None
                val e = if (orig.nullable) call else KnownNotNull(call)
                Alias(e, orig.name)(exprId = orig.exprId)
            }
          }
        Some(Aggregate(newGroupings, newAggs, mvPlan))
      }
    }
  }
}
