package graft.sources

import java.sql.Connection

import scala.collection.mutable

import graft.core.Identifiers.quoteLiteral

/** Foreign-key dependency analysis (J3) — reference
  * `src/migration/filtered.rs:28-64` (recursive CTE over `pg_constraint`
  * finding the TRUNCATE CASCADE blast radius) and `:88-125` (abort when a
  * cascade target is outside the copy scope — the data-loss guard).
  *
  * The SQL mirrors the reference; the closure/ordering algorithms are
  * also available as pure graph functions over an edge list (child →
  * parent), because FK metadata is tiny driver-side data and the same
  * walk drives both the safety check and the FK-respecting write order
  * (the reference's `pg_restore -j1` exists to preserve exactly this
  * order — `src/migration/restore.rs:180-198`).
  */
object FkGraph {

  /** (referencing child, referenced parent) — "child has an FK to parent". */
  final case class FkEdge(child: String, parent: String)

  def cascadeTargetsSql(schema: String, table: String): String =
    s"""WITH RECURSIVE fk_tree AS (
       |    SELECT n.nspname AS schema_name, c.relname AS table_name, 0 AS depth
       |    FROM pg_class c
       |    JOIN pg_namespace n ON c.relnamespace = n.oid
       |    WHERE n.nspname = ${quoteLiteral(schema)} AND c.relname = ${quoteLiteral(table)}
       |    UNION ALL
       |    SELECT n2.nspname, c2.relname, fk_tree.depth + 1
       |    FROM fk_tree
       |    JOIN pg_constraint con ON con.confrelid = (
       |        SELECT c.oid FROM pg_class c
       |        JOIN pg_namespace n ON c.relnamespace = n.oid
       |        WHERE n.nspname = fk_tree.schema_name
       |          AND c.relname = fk_tree.table_name)
       |    JOIN pg_class c2 ON con.conrelid = c2.oid
       |    JOIN pg_namespace n2 ON c2.relnamespace = n2.oid
       |    WHERE con.contype = 'f')
       |SELECT DISTINCT schema_name, table_name
       |FROM fk_tree WHERE depth > 0
       |ORDER BY schema_name, table_name""".stripMargin

  /** All FK edges of a database — one catalog query, walked driver-side. */
  val listFkEdgesSql: String =
    """SELECT n1.nspname || '.' || c1.relname AS child,
      |       n2.nspname || '.' || c2.relname AS parent
      |FROM pg_constraint con
      |JOIN pg_class c1 ON con.conrelid = c1.oid
      |JOIN pg_namespace n1 ON c1.relnamespace = n1.oid
      |JOIN pg_class c2 ON con.confrelid = c2.oid
      |JOIN pg_namespace n2 ON c2.relnamespace = n2.oid
      |WHERE con.contype = 'f'
      |ORDER BY child, parent""".stripMargin

  def cascadeTargets(conn: Connection, schema: String, table: String): List[(String, String)] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(cascadeTargetsSql(schema, table))
      val out = mutable.ListBuffer.empty[(String, String)]
      while (rs.next()) out += ((rs.getString(1), rs.getString(2)))
      out.toList
    } finally st.close()
  }

  def listFkEdges(conn: Connection): List[FkEdge] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(listFkEdgesSql)
      val out = mutable.ListBuffer.empty[FkEdge]
      while (rs.next()) out += FkEdge(rs.getString(1), rs.getString(2))
      out.toList
    } finally st.close()
  }

  /** Tables whose rows would be removed by `TRUNCATE table CASCADE`:
    * transitive closure of "references" edges toward `start` (children
    * of the truncated parent, their children, …). Pure BFS over the edge
    * list — the graph form of the recursive CTE. */
  def cascadeClosure(edges: Seq[FkEdge], start: String): Set[String] = {
    val byParent = edges.groupBy(_.parent)
    val seen = mutable.Set.empty[String]
    val queue = mutable.Queue(start)
    while (queue.nonEmpty) {
      val t = queue.dequeue()
      byParent.getOrElse(t, Nil).map(_.child).foreach { c =>
        if (seen.add(c)) queue.enqueue(c)
      }
    }
    seen.toSet - start
  }

  /** The data-loss guard (`filtered.rs:88-125`): every table the CASCADE
    * would touch must itself be in the copy scope. */
  def checkCascadeSafety(copyScope: Set[String], edges: Seq[FkEdge],
                         toTruncate: Set[String]): Either[String, Unit] = {
    val blast = toTruncate.flatMap(t => cascadeClosure(edges, t))
    val outside = (blast -- copyScope).toSeq.sorted
    if (outside.isEmpty) Right(())
    else Left(
      s"FK-related tables would be truncated by CASCADE but are NOT being copied " +
        s"(data loss): ${outside.mkString(", ")}")
  }

  /** FK-respecting write order: parents before children (the reason the
    * reference restores with -j1). Kahn's algorithm; tables outside the
    * edge list keep their relative order; a cycle falls back to the
    * original order for its members (PG allows FK cycles via deferred
    * constraints — writing them in any order then validating is the
    * reference's behavior too). */
  def topoOrder(tables: Seq[String], edges: Seq[FkEdge]): Seq[String] = {
    val inScope = tables.toSet
    val deps = edges.filter(e => inScope(e.child) && inScope(e.parent))
    val childrenOf = deps.groupBy(_.parent).view.mapValues(_.map(_.child)).toMap
    val indeg = mutable.Map(tables.map(t => t -> 0): _*)
    deps.foreach(e => indeg(e.child) += 1)
    val ready = mutable.Queue(tables.filter(indeg(_) == 0): _*)
    val out = mutable.ListBuffer.empty[String]
    while (ready.nonEmpty) {
      val t = ready.dequeue()
      out += t
      childrenOf.getOrElse(t, Nil).foreach { c =>
        indeg(c) -= 1
        if (indeg(c) == 0) ready.enqueue(c)
      }
    }
    out.toList ++ tables.filterNot(out.contains) // cycle remainder, stable
  }
}
