package graft.dag

import scala.collection.mutable

/** Topology serialization — the engine analogue of the reference's
  * `Graph.to_dict`/`from_dict` (/root/reference/mldag/core/graph.py:938-1077),
  * which round-trips vertices+edges as `{module, class, params}` dicts and
  * re-imports classes by name. Here the import-by-name step is a
  * reflection-free REGISTRY: each serializable node class contributes a
  * factory keyed by its kind string; nodes expose their constructor params
  * as a JSON-able map (`Node.jsonParams`).
  *
  * Closure-carrying nodes (FnNode) are not serializable — the reference had
  * the same boundary (pickled functions must be importable, not lambdas).
  */
object DagJson {
  type Params = Map[String, Any]
  type Factory = Params => Node

  private val registry = mutable.Map[String, Factory]()
  def register(kind: String)(f: Factory): Unit = registry(kind) = f

  // ---------------- params accessors (tolerant of json4s numeric widening) --
  implicit class P(val m: Params) extends AnyVal {
    def str(k: String): String = m(k).asInstanceOf[String]
    def strOpt(k: String): Option[String] = m.get(k).collect { case s: String => s }
    def int(k: String): Int = m(k) match { case i: Int => i; case l: Long => l.toInt; case b: BigInt => b.toInt }
    def dbl(k: String): Double = m(k) match { case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble; case b: BigInt => b.toDouble }
    def bool(k: String): Boolean = m(k).asInstanceOf[Boolean]
    def boolOr(k: String, d: Boolean): Boolean = m.get(k).fold(d)(_.asInstanceOf[Boolean])
    def intOr(k: String, d: Int): Int = if (m.contains(k) && m(k) != null) int(k) else d
    def lng(k: String): Long = m(k) match { case i: Int => i.toLong; case l: Long => l; case b: BigInt => b.toLong }
    def lngOr(k: String, d: Long): Long = if (m.contains(k) && m(k) != null) lng(k) else d
    def strs(k: String): Seq[String] = m.getOrElse(k, Nil).asInstanceOf[Seq[Any]].map(_.toString)
    def pairs(k: String): Seq[(String, String)] =
      m.getOrElse(k, Nil).asInstanceOf[Seq[Any]].map {
        case s: Seq[_] => (s(0).toString, s(1).toString)
        case (a, b)    => (a.toString, b.toString)
      }
  }

  // ---------------- JSON writer/parser (json4s ships with Spark) -----------
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def toJValue(v: Any): JValue = v match {
    case null            => JNull
    case s: String       => JString(s)
    case i: Int          => JInt(i)
    case l: Long         => JLong(l)
    case d: Double       => JDouble(d)
    case b: Boolean      => JBool(b)
    case o: Option[_]    => o.fold[JValue](JNull)(toJValue)
    case (a, b)          => JArray(List(toJValue(a), toJValue(b)))
    case s: Seq[_]       => JArray(s.map(toJValue).toList)
    case m: Map[_, _]    => JObject(m.map { case (k, x) => k.toString -> toJValue(x) }.toList)
    case other           => JString(other.toString)
  }

  private def fromJValue(v: JValue): Any = v match {
    case JNull | JNothing => null
    case JString(s)       => s
    case JInt(i)          => if (i.isValidInt) i.toInt else i.toLong
    case JLong(l)         => l
    case JDouble(d)       => d
    case JDecimal(d)      => d.toDouble
    case JBool(b)         => b
    case JArray(xs)       => xs.map(fromJValue)
    case JObject(fs)      => fs.map { case (k, x) => k -> fromJValue(x) }.toMap
    case JSet(xs)         => xs.map(fromJValue)
  }

  /** Topology as plain Scala collections — reusable for nesting: a
    * SubDagNode's params embed its inner dag via this map form (reference
    * MLDagNode round-trips through Graph.to_dict the same way).
    */
  def dagToMap(dag: Dag): Map[String, Any] = Map(
    "dag" -> dag.dagName,
    "nodes" -> dag.nodes.map { n =>
      val kind = n.jsonKind.getOrElse(
        throw new GraftException(
          s"node '${n.name}' (${n.getClass.getSimpleName}) is not JSON-serializable " +
            "(closure-carrying nodes cannot round-trip; give the node a jsonKind/jsonParams)"))
      Map("name" -> n.name, "kind" -> kind, "params" -> n.jsonParams)
    },
    "edges" -> dag.edges.map(e => Seq(e.from, e.fromPort, e.to, e.toPort)).toSeq,
    "deps" -> dag.deps.map { case (a, b) => Seq(a, b) }.toSeq,
    "inputs" -> dag.inputBinds.map(b => Seq(b.inName, b.node, b.port)).toSeq,
    "outputs" -> dag.outputBinds.map { case (o, (n, p)) => Seq(o, n, p) }.toSeq,
    // IVM chain topology (from, kind, to): process-local subscriptions do
    // not survive a restart, so the DECLARATIONS must — a restored pipeline
    // re-attaches them over loaded state via Dag.reattachChains
    "chains" -> dag.chainDecls.map { case (f, k, t) => Seq(f, k, t) }.toSeq)

  def dagFromMap(m: Map[String, Any]): Dag = {
    val dag = new Dag(m("dag").toString)
    val byName = mutable.Map[String, Node]()
    m("nodes").asInstanceOf[Seq[Any]].foreach { any =>
      val jn = any.asInstanceOf[Map[String, Any]]
      val nm = jn("name").toString
      val kind = jn("kind").toString
      val params = jn("params").asInstanceOf[Map[String, Any]]
      val factory = registry.getOrElse(kind,
        throw new GraftException(s"no factory registered for node kind '$kind'"))
      val node = factory(params).named(nm)
      dag.add(node)
      byName(nm) = node
    }
    def strs(any: Any): Seq[String] = any.asInstanceOf[Seq[Any]].map(_.toString)
    m("edges").asInstanceOf[Seq[Any]].foreach { j =>
      val Seq(from, fp, to, tp) = strs(j)
      dag.connect(byName(from), Some(fp), byName(to), Some(tp))
    }
    m("deps").asInstanceOf[Seq[Any]].foreach { j =>
      val Seq(a, b) = strs(j); dag.addDependency(a, b)
    }
    m("inputs").asInstanceOf[Seq[Any]].foreach { j =>
      val Seq(in, n, p) = strs(j); dag.setInput(byName(n), Some(in), Some(p))
    }
    m("outputs").asInstanceOf[Seq[Any]].foreach { j =>
      val Seq(o, n, p) = strs(j); dag.setOutput(o, byName(n), Some(p))
    }
    // optional for backward compatibility with pre-chain serializations
    m.get("chains").foreach(_.asInstanceOf[Seq[Any]].foreach { j =>
      val Seq(f, k, t) = strs(j); dag.addChain(byName(f), k, byName(t))
    })
    dag
  }

  // nested-dag node factory lives here (dag-core kind, not node library)
  register("sub_dag")(p => new SubDagNode(
    dagFromMap(p.m("dag").asInstanceOf[Map[String, Any]]), p.str("base")))

  def toJson(dag: Dag): String =
    JsonMethods.compact(JsonMethods.render(toJValue(dagToMap(dag))))

  /** Persist/load a topology to/from a file (reference round-trips dicts the
    * caller serializes; here the file form is first-class). */
  def save(dag: Dag, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(dag))
  def load(path: String): Dag =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def fromJson(json: String): Dag =
    dagFromMap(fromJValue(JsonMethods.parse(json)).asInstanceOf[Map[String, Any]])
}

/** DOT rendering — the equivalent of the reference's graphviz display
  * (/root/reference/mldag/display.py:17-358): record-shaped node boxes with
  * input/output PORT ROWS (display.py's HTML-table rows, rendered as graphviz
  * record fields so edges can anchor on their slots), nested SubDagNodes as
  * `cluster_` subgraphs with their own dag-input/output port ovals
  * (display.py:120-200 path-prefixed recursion), dashed order-only dependency
  * edges, and dag inputs/outputs as dotted ovals.
  */
/** Render palette (reference style/default.yml + dark_background.yml
  * equivalents): graph background, node fill/outline/text, edge color, and
  * the dag-input/output oval accent. */
final case class DotStyle(
    background: String,
    nodeFill: String, nodeOutline: String, nodeText: String,
    edge: String,
    portFill: String, portOutline: String, portText: String) {
  private[dag] def graphAttrs: String =
    s"""  bgcolor="$background";\n  edge [color="$edge", fontcolor="$nodeText"];\n""" +
      s"""  node [style=filled, fillcolor="$nodeFill", color="$nodeOutline", fontcolor="$nodeText"];\n"""
  private[dag] def portAttrs: String =
    s""", style="filled,dotted", fillcolor="$portFill", color="$portOutline", fontcolor="$portText""""
}
object DotStyle {
  /** Light palette (reference style/default.yml). */
  val default: DotStyle = DotStyle(
    background = "#ffffff",
    nodeFill = "#a1c9f4", nodeOutline = "#82b6ed", nodeText = "#000000",
    edge = "#00000077",
    portFill = "#f6bd98", portOutline = "#f6bd98", portText = "#000000")
  /** Dark palette (reference style/dark_background.yml). */
  val dark: DotStyle = DotStyle(
    background = "#1e1e1e",
    nodeFill = "#2d4f76", nodeOutline = "#82b6ed", nodeText = "#eeeeee",
    edge = "#ffffff77",
    portFill = "#7a4a22", portOutline = "#f6bd98", portText = "#eeeeee")
}

object DagDot {
  private def esc(s: String) = s.replace("\"", "\\\"")
  private def rec(s: String) = // record-field text: escape the record metachars
    s.replaceAll("([{}<>|])", "\\\\$1")

  def toDot(dag: Dag): String = toDot(dag, None, Int.MaxValue)
  def toDot(dag: Dag, style: DotStyle): String = toDot(dag, Some(style), Int.MaxValue)
  /** `maxDepth` caps nested-cluster recursion (reference `max_mldag_depth`,
    * display.py:17-40): SubDagNodes deeper than the cap render as plain
    * record nodes instead of expanded clusters. */
  def toDot(dag: Dag, style: Option[DotStyle], maxDepth: Int): String = {
    val sb = new StringBuilder(s"digraph \"${esc(dag.dagName)}\" {\n  rankdir=LR;\n")
    style.foreach(s => sb ++= s.graphAttrs)
    val pa = style.map(_.portAttrs).getOrElse("")
    renderBody(dag, "", "  ", sb, pa, maxDepth)
    dag.inputBinds.foreach { b =>
      sb ++= s"""  "in:${esc(b.inName)}" [shape=oval, style=dotted$pa];\n"""
      val (to, hp) = inEndpoint(dag, "", b.node, b.port, maxDepth)
      sb ++= s"""  "in:${esc(b.inName)}" -> $to [label="${esc(b.port)}"$hp];\n"""
    }
    dag.outputBinds.foreach { case (o, (n, p)) =>
      sb ++= s"""  "out:${esc(o)}" [shape=oval, style=dotted$pa];\n"""
      val (from, tp) = outEndpoint(dag, "", n, p, maxDepth)
      sb ++= s"""  $from -> "out:${esc(o)}" [label="${esc(p)}"$tp];\n"""
    }
    sb ++= "}\n"
    sb.toString
  }

  private def depthOf(path: String): Int = path.count(_ == '/')
  private def expanded(path: String, maxDepth: Int): Boolean = depthOf(path) < maxDepth

  /** Edge endpoint for a payload ARRIVING at `(node, port)`: an EXPANDED
    * SubDagNode resolves to its inner dag-input oval inside the cluster; a
    * collapsed one (past maxDepth) or a plain node anchors on its input
    * record field.
    */
  private def inEndpoint(dag: Dag, path: String, node: String, port: String,
                         maxDepth: Int): (String, String) =
    dag.node(node) match {
      case sd: SubDagNode if expanded(path, maxDepth) =>
        (s""""${esc(s"$path${sd.name}/in:$port")}"""", "")
      case _ => (s""""${esc(s"$path$node")}"""", s""", headport="i_${esc(port)}"""")
    }

  /** Edge endpoint for a payload LEAVING `(node, port)` — dual of inEndpoint. */
  private def outEndpoint(dag: Dag, path: String, node: String, port: String,
                          maxDepth: Int): (String, String) =
    dag.node(node) match {
      case sd: SubDagNode if expanded(path, maxDepth) =>
        (s""""${esc(s"$path${sd.name}/out:$port")}"""", "")
      case _ => (s""""${esc(s"$path$node")}"""", s""", tailport="o_${esc(port)}"""")
    }

  private def renderBody(dag: Dag, path: String, indent: String, sb: StringBuilder,
                         pa: String = "", maxDepth: Int = Int.MaxValue): Unit = {
    dag.nodes.foreach {
      case sd: SubDagNode if expanded(path, maxDepth) =>
        val cpath = s"$path${sd.name}/"
        sb ++= s"""${indent}subgraph "cluster_${esc(cpath)}" {\n"""
        sb ++= s"""$indent  label="${esc(sd.name)} : ${esc(sd.inner.dagName)}"; style=rounded;\n"""
        // the inner dag's named inputs/outputs become port ovals INSIDE the
        // cluster (reference _render_mldag_ports, display.py:144-167)
        sd.inner.inputBinds.map(_.inName).distinct.foreach { in =>
          sb ++= s"""$indent  "${esc(s"${cpath}in:$in")}" [shape=oval, style=dotted, label="${esc(in)}"$pa];\n"""
        }
        sd.inner.outputBinds.keys.foreach { o =>
          sb ++= s"""$indent  "${esc(s"${cpath}out:$o")}" [shape=oval, style=dotted, label="${esc(o)}"$pa];\n"""
        }
        renderBody(sd.inner, cpath, indent + "  ", sb, pa, maxDepth)
        // wire the port ovals to their inner bindings
        sd.inner.inputBinds.foreach { b =>
          val (to, hp) = inEndpoint(sd.inner, cpath, b.node, b.port, maxDepth)
          sb ++= s"""$indent  "${esc(s"${cpath}in:${b.inName}")}" -> $to [label="${esc(b.port)}"$hp];\n"""
        }
        sd.inner.outputBinds.foreach { case (o, (n, p)) =>
          val (from, tp) = outEndpoint(sd.inner, cpath, n, p, maxDepth)
          sb ++= s"""$indent  $from -> "${esc(s"${cpath}out:$o")}" [label="${esc(p)}"$tp];\n"""
        }
        sb ++= s"$indent}\n"
      case n =>
        // record node: {input port row | name (class) | output port row}
        val ins = if (n.inputs.isEmpty) "" else
          "{" + n.inputs.map(p => s"<i_${p.name}> ${rec(p.name)}").mkString("|") + "}|"
        val outs = if (n.outputs.isEmpty) "" else
          "|{" + n.outputs.map(p => s"<o_${p.name}> ${rec(p.name)}").mkString("|") + "}"
        sb ++= s"""$indent"${esc(s"$path${n.name}")}" [shape=record, label="{$ins${rec(n.name)}\\n(${n.getClass.getSimpleName})$outs}"];\n"""
    }
    dag.edges.foreach { e =>
      val (from, tp) = outEndpoint(dag, path, e.from, e.fromPort, maxDepth)
      val (to, hp) = inEndpoint(dag, path, e.to, e.toPort, maxDepth)
      sb ++= s"""$indent$from -> $to [label="${esc(e.fromPort)}→${esc(e.toPort)}"$tp$hp];\n"""
    }
    dag.deps.foreach { case (a, b) =>
      // dep endpoints on an EXPANDED SubDagNode must anchor inside the
      // cluster (its plain id does not exist as a node there); use the first
      // inner port oval, falling back RECURSIVELY through the first inner
      // node (which may itself be an expanded sub-dag)
      def depId(n: String): String = depIdIn(dag, path, n)
      def depIdIn(d: Dag, p: String, n: String): String = d.node(n) match {
        case sd: SubDagNode if expanded(p, maxDepth) =>
          val cpath = s"$p${sd.name}/"
          sd.inner.inputBinds.headOption.map(bn => s"${cpath}in:${bn.inName}")
            .orElse(sd.inner.outputBinds.headOption.map { case (o, _) => s"${cpath}out:$o" })
            .orElse(sd.inner.nodeNames.headOption.map(depIdIn(sd.inner, cpath, _)))
            .getOrElse(s"$p$n")
        case _ => s"$p$n"
      }
      sb ++= s"""$indent"${esc(depId(a))}" -> "${esc(depId(b))}" [style=dashed, label="dep"];\n"""
    }
  }
}
