package graft.trgx

import scala.collection.immutable.TreeMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

/** The "trgx" recursive tree library (SURVEY §2.8 map/array/tree; reference
  * src/common/trgx.clj:212-275 and
  * src/bolome/mlvar/d_bolome_user_order_stat.clj:73-135).
  *
  * A trgx is `{nodeKey → {DATA: {k→v}, CHILDREN: {childKey → trgx-node}}}`.
  * The reference stores these as EDN text in a Postgres column; here the
  * storage form is a canonical JSON string column (sorted keys), with this
  * ADT + codec used inside UDFs. Arbitrary recursion has no static Spark
  * type, so JSON-string columns are the faithful representation (SURVEY §1
  * "Nested data").
  */
final case class TrgxNode(data: Map[String, String],
                          children: Map[String, TrgxNode]) {
  def isLeaf: Boolean = children.isEmpty
}

object TrgxNode {
  val empty: TrgxNode = TrgxNode(Map.empty, Map.empty)
}

object Trgx {
  /** A trgx "tree" is a map of root keys → nodes (the reference's outer
    * map may hold one or many roots). */
  type Tree = Map[String, TrgxNode]

  // every observable key ordering below (canonical JSON, pathSeq walk,
  // child merges) sorts in UTF-8 byte order, matching the DuckDB
  // oracle's byte collation — NOT Java's UTF-16 code-unit order, which
  // diverges on supplementary-plane keys (see graft.functions.Utf8Order)
  private implicit val keyOrd: Ordering[String] =
    graft.functions.Utf8Order.ordering

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  // ---------- JSON codec (EDN-in-TEXT equivalent) ----------

  private def nodeToJson(n: TrgxNode): ObjectNode = {
    val o = nf.objectNode()
    val d = nf.objectNode()
    TreeMap(n.data.toSeq: _*).foreach { case (k, v) =>
      if (v == null) d.putNull(k) else d.put(k, v)
    }
    o.set[ObjectNode]("DATA", d)
    val c = nf.objectNode()
    TreeMap(n.children.toSeq: _*).foreach { case (k, ch) =>
      c.set[ObjectNode](k, nodeToJson(ch))
    }
    o.set[ObjectNode]("CHILDREN", c)
    o
  }

  /** Jackson tree-model render — kept as the reference implementation;
    * PropertiesSpec asserts `toJson` matches it on random trees. */
  private[graft] def toJsonJackson(t: Tree): String = {
    val o = nf.objectNode()
    TreeMap(t.toSeq: _*).foreach { case (k, n) => o.set[ObjectNode](k, nodeToJson(n)) }
    mapper.writeValueAsString(o)
  }

  /** Jackson-compatible string escape: short escapes for the common
    * controls, uppercase `\\u00XX` for the rest, raw non-ASCII. */
  private def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) {
            sb.append("\\u00")
            val hex = "0123456789ABCDEF"
            sb.append(hex((c >> 4) & 0xf)).append(hex(c & 0xf))
          } else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def writeNode(sb: java.lang.StringBuilder, n: TrgxNode): Unit = {
    sb.append("{\"DATA\":{")
    var first = true
    n.data.toSeq.sortBy(_._1).foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      esc(sb, k); sb.append(':')
      if (v == null) sb.append("null") else esc(sb, v)
    }
    sb.append("},\"CHILDREN\":{")
    first = true
    n.children.toSeq.sortBy(_._1).foreach { case (k, ch) =>
      if (!first) sb.append(',')
      first = false
      esc(sb, k); sb.append(':')
      writeNode(sb, ch)
    }
    sb.append("}}")
  }

  /** Canonical (sorted-key) JSON of a tree — direct StringBuilder
    * writer, byte-identical to the Jackson tree-model render but ~15×
    * faster (no per-node TreeMap/ObjectNode churn; this runs once per
    * user per mlvar build, the hot serialization path). */
  def toJson(t: Tree): String = {
    val sb = new java.lang.StringBuilder(256)
    sb.append('{')
    var first = true
    t.toSeq.sortBy(_._1).foreach { case (k, n) =>
      if (!first) sb.append(',')
      first = false
      esc(sb, k); sb.append(':')
      writeNode(sb, n)
    }
    sb.append('}')
    sb.toString
  }

  private def nodeFromJson(j: JsonNode): TrgxNode = {
    val data = Option(j.get("DATA")).map { d =>
      val it = d.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }.getOrElse(Map.empty[String, String])
    val children = Option(j.get("CHILDREN")).map { c =>
      val it = c.fields()
      val b = Map.newBuilder[String, TrgxNode]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> nodeFromJson(e.getValue)
      }
      b.result()
    }.getOrElse(Map.empty[String, TrgxNode])
    TrgxNode(data, children)
  }

  def fromJson(s: String): Tree = {
    val root = mapper.readTree(s)
    val it = root.fields()
    val b = Map.newBuilder[String, TrgxNode]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> nodeFromJson(e.getValue)
    }
    b.result()
  }

  // ---------- core ops (trgx.clj:212-275) ----------

  /** `trgx->leaf` (trgx.clj:212): is this single-root tree a leaf. */
  def isLeaf(t: Tree): Boolean = t.size == 1 && t.head._2.isLeaf

  /** `trgx-get-in` (trgx.clj:215): node at key path, if present. */
  def getIn(t: Tree, path: Seq[String]): Option[TrgxNode] = path match {
    case Nil => None
    case h +: rest =>
      t.get(h).flatMap { n =>
        if (rest.isEmpty) Some(n) else getIn(n.children, rest)
      }
  }

  /** `trgx-assoc-in` (trgx.clj:217): set/merge DATA at key path, creating
    * intermediate nodes. */
  def assocIn(t: Tree, path: Seq[String], data: Map[String, String]): Tree =
    path match {
      case Nil => t
      case h +: rest =>
        val cur = t.getOrElse(h, TrgxNode.empty)
        val upd =
          if (rest.isEmpty) cur.copy(data = cur.data ++ data)
          else cur.copy(children = assocIn(cur.children, rest, data))
        t.updated(h, upd)
    }

  /** `trgx->path` (trgx.clj:220): key path of the single chain in a
    * linear tree (first child at each level). */
  def path(t: Tree): Seq[String] = {
    def walk(m: Tree, acc: Vector[String]): Vector[String] =
      if (m.isEmpty) acc
      else {
        val (k, n) = m.toSeq.minBy(_._1)
        walk(n.children, acc :+ k)
      }
    walk(t, Vector.empty)
  }

  /** `trgx-path-seq` (trgx.clj:226): all root-to-leaf key paths, sorted. */
  def pathSeq(t: Tree): Seq[Seq[String]] = {
    def walk(m: Tree, prefix: Vector[String]): Seq[Vector[String]] =
      TreeMap(m.toSeq: _*).toSeq.flatMap { case (k, n) =>
        if (n.isLeaf) Seq(prefix :+ k) else walk(n.children, prefix :+ k)
      }
    walk(t, Vector.empty)
  }

  /** `trgx-take` (trgx.clj:229): truncate to the first n levels. */
  def take(t: Tree, n: Int): Tree =
    if (n <= 0) Map.empty
    else t.map { case (k, nd) => k -> nd.copy(children = take(nd.children, n - 1)) }

  /** `trgx-last` (trgx.clj:234): depth of the tree. */
  def depth(t: Tree): Int =
    if (t.isEmpty) 0 else 1 + t.values.map(n => depth(n.children)).max

  /** Set a full node at a key path, creating intermediate nodes. */
  private def setNodeIn(t: Tree, path: Seq[String], node: TrgxNode): Tree =
    path match {
      case Nil => t
      case h +: Nil => t.updated(h, node)
      case h +: rest =>
        val cur = t.getOrElse(h, TrgxNode.empty)
        t.updated(h, cur.copy(children = setNodeIn(cur.children, rest, node)))
    }

  /** Leaf-key → root-to-leaf path map (`trgx->path`, trgx.clj:220). */
  def leafPaths(t: Tree): Map[String, Seq[String]] =
    pathSeq(t).map(p => p.last -> p).toMap

  /** `trgx-take-last` (trgx.clj:239-244): keep the first n levels and
    * re-attach each chain's deepest leaf directly below its truncated
    * prefix (the reference's custom take-last: `header :+ last tail`). */
  def takeLast(t: Tree, n: Int): Tree =
    pathSeq(t).foldLeft(take(t, n)) { (acc, p) =>
      val np = if (p.length > n) p.take(n) :+ p.last else p
      setNodeIn(acc, np, getIn(t, p).get)
    }

  /** Every node path (prefix-closure of the leaf paths), sorted.
    *
    * Representation-level deviation from `trgx-path-seq`
    * (trgx.clj:226-227): the reference enumerates only nodes that
    * literally carry a `:DATA` key — intermediates created implicitly
    * by `trgx-assoc-in` have none and are skipped there. A graft
    * `TrgxNode` ALWAYS carries a `data` map (possibly empty), so the
    * prefix-closure here can emit records for data-less intermediates
    * the reference would omit. EDN-faithful enumeration would need an
    * explicit has-DATA flag per node; graft deliberately treats every
    * materialized node as enumerable. */
  private def nodePaths(t: Tree): Seq[Seq[String]] =
    pathSeq(t).flatMap(p => (1 to p.length).map(p.take)).distinct

  /** `trgx-split-at` (trgx.clj:246-247), exact reference semantics:
    * every node path of length ≤ n becomes a (path, {lastKey → node})
    * record — the subtree keyed by the node's OWN key (the reference's
    * `{:PATH p :SUBTREE {(last p) node}}`). Records overlap by
    * construction: a depth-1 node's subtree still contains the depth-2
    * nodes that also emit their own records; shallow branches are
    * KEPT (they used to vanish — the previous form walked exactly n
    * levels and dropped anything shallower). */
  def splitAt(t: Tree, n: Int): Seq[(Seq[String], Tree)] =
    nodePaths(t).filter(_.length <= n)
      .map(p => (p, Map(p.last -> getIn(t, p).get)))

  /** `trgx-leaf-trunc` (trgx.clj:265-269), exact reference semantics:
    * re-home every leaf node at `(take level full-path) :+ leaf-key`,
    * where `trgx->path`'s value INCLUDES the leaf key. So unlike
    * `takeLast` (whose custom take-last guards `(if (last tail) …
    * header)`), a leaf whose path is already within `level` gains a
    * duplicated self-keyed tail: `[a b]` at level 2 → `[a b b]`. The
    * unguarded form below IS the reference behavior.
    *
    * Representation-level deviation: the reference indexes leaves by
    * bare leaf key (`trgx->leaf`/`trgx->path` are maps), so two leaves
    * sharing a key across branches collapse to whichever wins the
    * `into {}`; we fold over every distinct leaf PATH, keeping both
    * unless their truncated paths collide (then last-in-sort wins). */
  def leafTrunc(t: Tree, level: Int): Tree =
    pathSeq(t).foldLeft(Map.empty: Tree) { (acc, p) =>
      setNodeIn(acc, p.take(level) :+ p.last, getIn(t, p).get)
    }

  /** `trgx->kv` / `path-trgx->kv` (trgx.clj:271-275): flatten to
    * (path-joined-key → leaf DATA) pairs. */
  def toKv(t: Tree, sep: String = "/"): Map[String, Map[String, String]] = {
    def walk(m: Tree, prefix: Vector[String]): Seq[(String, Map[String, String])] =
      TreeMap(m.toSeq: _*).toSeq.flatMap { case (k, n) =>
        val p = prefix :+ k
        if (n.isLeaf) Seq(p.mkString(sep) -> n.data)
        else walk(n.children, p)
      }
    walk(t, Vector.empty).toMap
  }

  /** `node->id` (trgx.clj:49): a config node key carries its id in
    * square brackets (`"name[id]"` → `"id"`); keys without a bracketed
    * id pass through with a leading `[]` stripped. */
  private val BracketId = "\\[(\\S+)]".r
  def nodeId(key: String): String =
    BracketId.findFirstMatchIn(key).map(_.group(1))
      .getOrElse(key.replaceFirst("^\\[\\]", ""))

  /** `latest-trgx-merge` (trgx.clj:202-207): the conf tree groups the
    * root's children one level deep (the reference's `:BRANCH` group
    * maps); collapse that grouping — the node's new children are the
    * union of all its group nodes' children, later groups winning key
    * collisions like Clojure's `merge`. */
  def collapseGroups(t: Tree, key: String): Tree =
    t.get(key).fold(t) { n =>
      val merged = TreeMap(n.children.toSeq: _*).values
        .foldLeft(Map.empty: Tree)((acc, g) => acc ++ g.children)
      t.updated(key, n.copy(children = merged))
    }

  /** `latest-trgx-kpi` (trgx.clj:209-210): one group's subtree under
    * the root (root → group key → children). */
  def groupSubtree(t: Tree, key: String, group: String): Tree =
    getIn(t, Seq(key, group)).map(_.children).getOrElse(Map.empty)

  /** `kv->trgx` (trgx.clj:49-55): attach `{id → data}` onto the leaves of
    * a config tree whose leaf keys normalize to those ids. */
  def kvToTrgx(config: Tree, kv: Map[String, Map[String, String]],
               normalize: String => String = identity): Tree =
    config.map { case (k, n) =>
      if (n.isLeaf)
        k -> n.copy(data = n.data ++ kv.getOrElse(normalize(k), Map.empty))
      else k -> n.copy(children = kvToTrgx(n.children, kv, normalize))
    }

  // ---------- path queries (mlvar/d_bolome_user_order_stat.clj:73-95) ----

  sealed trait PathStep
  case class Key(k: String) extends PathStep
  /** key list — the reference's `select-keys` filter form. */
  case class Keys(ks: Set[String]) extends PathStep
  case object Wildcard extends PathStep
  /** `[:range a b]`: keys lexicographically in [a, b]. */
  case class Range(lo: String, hi: String) extends PathStep

  /** `subtree` / `tree-nodes`: all (path, node) matches of a step pattern. */
  def query(t: Tree, steps: Seq[PathStep]): Seq[(Seq[String], TrgxNode)] = {
    def matches(k: String, s: PathStep): Boolean = s match {
      case Key(x)       => k == x
      case Keys(ks)     => ks.contains(k)
      case Wildcard     => true
      // UTF-8 byte order like every other key ordering in this file —
      // plain String >=/<= is UTF-16 code-unit order, which diverges
      // on supplementary-plane keys (date keys are ASCII, where the
      // two agree, but the contract is the file-wide collation)
      case Range(a, b)  =>
        keyOrd.compare(k, a) >= 0 && keyOrd.compare(k, b) <= 0
    }
    def walk(m: Tree, prefix: Vector[String],
             rest: Seq[PathStep]): Seq[(Seq[String], TrgxNode)] =
      rest match {
        case Nil => Seq.empty
        case s +: tail =>
          TreeMap(m.toSeq: _*).toSeq.filter(e => matches(e._1, s)).flatMap {
            case (k, n) =>
              val p = prefix :+ k
              if (tail.isEmpty) Seq((p, n)) else walk(n.children, p, tail)
          }
      }
    walk(t, Vector.empty, steps)
  }

  /** `tree-nodes [... :DATA fields]`: pluck DATA values in field order
    * (missing fields → null), matching the reference's ordered
    * extraction before `partition`/`zipmap`. */
  def dataFieldValues(n: TrgxNode, fields: Seq[String]): Seq[String] =
    fields.map(f => n.data.getOrElse(f, null))

  /** Numeric coercion used by the shift-cut sums: booleans count as
    * 0/1, like the reference's `(condp = % "false" 0 "true" 1 %)`
    * (mlvar/d_bolome_user_order_stat.clj:108). */
  private def numeric(v: String): Double = v match {
    case "true"  => 1.0
    case "false" => 0.0
    case s => try s.toDouble catch { case _: Throwable => 0.0 }
  }

  /** Sum numeric DATA fields of all nodes `leafDepth` levels below the
    * date keys falling in [lo, hi] (the reference's wildcard chains,
    * e.g. `[:range a b] "*" "*"` for order-level sums). */
  def windowSums(t: Tree, lo: String, hi: String,
                 leafDepth: Int = 1): Map[String, Double] =
    query(t, Range(lo, hi) +: Seq.fill(leafDepth)(Wildcard))
      .foldLeft(Map.empty[String, Double]) { case (acc, (_, n)) =>
        n.data.foldLeft(acc) { case (a, (k, v)) =>
          a.updated(k, a.getOrElse(k, 0.0) + numeric(v))
        }
      }

  /** `shift-cut-trgx` over explicit windows (the shape take-train-dts
    * produces): one feature map per (label, [lo, hi]) window. */
  def shiftCutWindows(t: Tree, windows: Seq[(Int, (String, String))],
                      leafDepth: Int = 1):
      Seq[(Int, Map[String, Double])] =
    windows.map { case (label, (lo, hi)) =>
      label -> windowSums(t, lo, hi, leafDepth)
    }

  /** `shift-cut-trgx` (mlvar/d_bolome_user_order_stat.clj:97-135),
    * fixed-stride form: k lookback windows of `windowDays` ending at
    * `asOf`. */
  def shiftCut(t: Tree, asOf: String, windowDays: Int, numWindows: Int,
               leafDepth: Int = 1): Seq[(Int, Map[String, Double])] = {
    val asOfDate = java.time.LocalDate.parse(asOf)
    shiftCutWindows(t, (0 until numWindows).map { w =>
      val hi = asOfDate.minusDays(w.toLong * windowDays)
      val lo = hi.minusDays(windowDays - 1L)
      w -> (lo.toString, hi.toString)
    }, leafDepth)
  }
}
