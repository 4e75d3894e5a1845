package graft.dag

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Directed data edge between node slots (reference `NodeConnection`,
  * /root/reference/mldag/core/mldagbase.py:194-217).
  */
final case class Edge(from: String, fromPort: String, to: String, toPort: String)

/** DAG-level input binding: run-time argument `inName` feeds `(node, port)`.
  * One name may feed many slots (reference set_input recursion,
  * mldagbase.py:1753-1761).
  */
final case class InputBind(inName: String, node: String, port: String)

/** The DAG: nodes + slot-edges + order-only dependencies + named DAG
  * inputs/outputs. Construction-time validation (slot existence,
  * single-writer, cross-dag, cycles) replaces the reference's dynamic
  * signature machinery (SURVEY.md §3.1). Execution is plan *composition*:
  * each node returns lazy DataFrames; Catalyst fuses the whole DAG into one
  * LogicalPlan per output (SURVEY.md §3.2-3.3), so the reference's
  * interpreter/deepcopy (/root/reference/mldag/mldag.py:322-385) has no
  * analogue here.
  */
final class Dag(val dagName: String = "dag") {
  private val nodeMap = mutable.LinkedHashMap[String, Node]()
  private[dag] val edges = mutable.ArrayBuffer[Edge]()
  private[dag] val deps = mutable.ArrayBuffer[(String, String)]() // (before, after)
  private[dag] val inputBinds = mutable.ArrayBuffer[InputBind]()
  private[dag] val outputBinds = mutable.LinkedHashMap[String, (String, String)]() // out -> (node, port)
  private val nameCounter = mutable.Map[String, Int]()
  private val listeners = mutable.ArrayBuffer[NodeListener]()

  /** Insert persist() at diamond fan-out points so shared subtrees are not
    * recomputed per consumer — the one optimizer concern Catalyst cannot see
    * (SURVEY.md §4). */
  var persistAtFanout: Boolean = true
  var fanoutStorageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK

  // ------------------------------------------------------------------
  // membership
  // ------------------------------------------------------------------
  def nodes: Seq[Node] = nodeMap.values.toSeq
  def nodeNames: Seq[String] = nodeMap.keys.toSeq
  /** Data edges in insertion order (read-only view). */
  def dataEdges: Seq[Edge] = edges.toSeq
  /** Order-only dependencies (before, after) in insertion order. */
  def dependencies: Seq[(String, String)] = deps.toSeq
  def node(name: String): Node =
    nodeMap.getOrElse(name, throw new GraftException(s"no node '$name' in dag '$dagName'"))
  def nodeOpt(name: String): Option[Node] = nodeMap.get(name)
  def contains(n: Node): Boolean = n.attached.contains(this)

  // ------------------------------------------------------------------
  // IVM chain topology (source's Δview feed -> downstream maintained state)
  // ------------------------------------------------------------------
  private[dag] val chainDecls = mutable.ArrayBuffer[(String, String, String)]()
  /** Chain declarations (from, kind, to) in insertion order — serialized by
    * DagJson so a restored pipeline knows what to re-attach. */
  def chains: Seq[(String, String, String)] = chainDecls.toSeq
  /** Record a chain between two attached nodes. The RUNTIME attach (fit or
    * re-attach) is the caller's move — this records topology only, so it
    * composes with both the fresh-fit path (source.chainX) and the restored
    * path ([[reattachChains]]). */
  def addChain(from: Node, kind: String, to: Node): Unit = {
    require(contains(from) && contains(to),
      s"addChain: both nodes must be attached to dag '$dagName'")
    require(from.isInstanceOf[ChainSource],
      s"addChain: '${from.name}' (${from.getClass.getSimpleName}) cannot " +
        "source a chain (not a ChainSource)")
    chainDecls += ((from.name, kind, to.name))
  }
  /** Re-attach every declared chain on ALREADY-LOADED nodes — the restart
    * path: each node's own saveFitted/loadFitted state is the seed, so no
    * refit happens here (an O(corpus) re-seed per restart is the failure
    * mode this exists to avoid). Sources re-subscribe in declaration order,
    * which preserves upstream-before-downstream notification order for
    * transitively chained state. */
  def reattachChains(ctx: Ctx): Unit = chainDecls.foreach { case (f, k, t) =>
    node(f) match {
      case cs: ChainSource => cs.reattachChain(ctx, k, node(t))
      case other => throw new GraftException(
        s"reattachChains: '$f' (${other.getClass.getSimpleName}) is not a ChainSource")
    }
  }

  /** Attach a node, auto-naming with counter dedup (reference add_vertex
    * override, mldagbase.py:1449-1482). Idempotent for already-attached nodes;
    * errors on cross-dag attach (reference graph.py:80-127).
    */
  def add[N <: Node](n: N): N = {
    n.attached match {
      case Some(d) if d eq this => n
      case Some(d) =>
        throw new GraftException(
          s"node '${n.name}' already belongs to dag '${d.dagName}', cannot add to '$dagName'")
      case None =>
        val base = n.nameBase
        // Counter-dedup applies to AUTO names only: silently renaming an
        // explicitly .named() node would break name-based references
        // (TransformNode parents, dag.node lookups) to the wrong vertex.
        if (n.assignedName.nonEmpty && nodeMap.contains(base))
          throw new GraftException(
            s"explicit node name '$base' already taken in dag '$dagName' — " +
              "pick a different .named(...) (auto-named nodes dedup with a counter; explicit names must be unique)")
        val nm =
          if (!nodeMap.contains(base) && n.assignedName.nonEmpty) base
          else if (!nodeMap.contains(base) && !nameCounter.contains(base)) base
          else {
            var i = nameCounter.getOrElse(base, 0)
            var cand = s"$base$i"
            while (nodeMap.contains(cand)) { i += 1; cand = s"$base$i" }
            nameCounter(base) = i + 1
            cand
          }
        if (nodeMap.contains(nm))
          throw new GraftException(s"duplicate node name '$nm' in dag '$dagName'")
        nameCounter.getOrElseUpdate(base, 1)
        n.assignedName = Some(nm)
        n.attached = Some(this)
        nodeMap(nm) = n
        n match { // weight-sharing fit-before-reuse barrier (mldagbase.py:1165-1170)
          case t: TransformNode => addDependency(t.parentName, nm)
          case _ =>
        }
        n
    }
  }

  private[dag] def addDependency(before: String, after: String): Unit =
    if (!deps.contains((before, after))) deps += ((before, after))

  // ------------------------------------------------------------------
  // wiring
  // ------------------------------------------------------------------
  private def writers(node: String, port: String): Int =
    edges.count(e => e.to == node && e.toPort == port) +
      inputBinds.count(b => b.node == node && b.port == port)

  /** Connect with slot inference: a single-output upstream / single-input (or
    * single-unbound-input) downstream may omit slot names (reference `connect`,
    * mldagbase.py:1849-1913).
    */
  def connect(up: Node, upSlot: Option[String], down: Node, downSlot: Option[String]): Unit = {
    add(up); add(down)
    val fromPort = upSlot match {
      case Some(s) =>
        if (!up.outputs.exists(_.name == s))
          throw new SlotException(s"node '${up.name}' has no output slot '$s' (has: ${up.outputs.map(_.name).mkString(", ")})")
        s
      case None => up.outputs match {
        case Seq(only) => only.name
        case outs => throw new SlotException(
          s"cannot infer output slot of '${up.name}' (${outs.size} outputs: ${outs.map(_.name).mkString(", ")})")
      }
    }
    val toPort = downSlot match {
      case Some(s) =>
        if (!down.inputs.exists(_.name == s))
          throw new SlotException(s"node '${down.name}' has no input slot '$s' (has: ${down.inputs.map(_.name).mkString(", ")})")
        s
      case None =>
        down.inputs match {
          case Seq(only) => only.name
          case ins =>
            val unbound = ins.filter(p => p.variadic || writers(down.name, p.name) == 0)
            unbound match {
              case Seq(only) => only.name
              case _ => throw new SlotException(
                s"cannot infer input slot of '${down.name}' (unbound: ${unbound.map(_.name).mkString(", ")})")
            }
        }
    }
    val port = down.inputs.find(_.name == toPort).get
    if (!port.variadic && writers(down.name, toPort) > 0)
      throw new SlotException(
        s"input slot '${down.name}.$toPort' already bound (non-variadic ports take one writer)")
    edges += Edge(up.name, fromPort, down.name, toPort)
  }

  def disconnect(up: Node, down: Node): Unit = {
    val before = edges.size
    edges.filterInPlace(e => !(e.from == up.name && e.to == down.name))
    if (edges.size == before)
      throw new GraftException(s"no edge ${up.name} -> ${down.name} to disconnect")
  }

  /** Remove a node and all touching edges/binds/deps (reference remove_vertex
    * + remove_input_node, graph.py:730-846, mldagbase.py:1485-1518).
    */
  def removeNode(n: Node): Unit = {
    val nm = n.name
    if (!contains(n)) throw new GraftException(s"node '$nm' not in dag '$dagName'")
    edges.filterInPlace(e => e.from != nm && e.to != nm)
    inputBinds.filterInPlace(_.node != nm)
    outputBinds.filterInPlace { case (_, (node, _)) => node != nm }
    deps.filterInPlace { case (a, b) => a != nm && b != nm }
    nodeMap.remove(nm)
    n.attached = None
  }

  // ------------------------------------------------------------------
  // DAG-level inputs / outputs (reference set_input/set_output,
  // mldagbase.py:1660-1813)
  // ------------------------------------------------------------------
  def input(name: String): DagInput = new DagInput(this, name)
  def output(name: String): DagOutput = new DagOutput(this, name)

  // DAG-input default payloads (reference MLDagInput.default); keyed by
  // input name, evaluated only when the run supplies no binding
  private val inputDefaults = mutable.Map[String, Ctx => DataFrame]()
  private[dag] def setInputDefault(name: String, f: Ctx => DataFrame): Unit =
    inputDefaults(name) = f

  def inputNames: Seq[String] = inputBinds.map(_.inName).distinct.toSeq
  def inputPorts: Seq[Port] = inputNames.map { n =>
    val bound = inputBinds.filter(_.inName == n)
      .flatMap(b => nodeMap(b.node).inputs.find(_.name == b.port))
    Port(n, bound.exists(_.variadic), keyed = bound.exists(_.keyed))
  }
  def outputNames: Seq[String] = outputBinds.keys.toSeq

  /** Bind a DAG-level named argument to a node input slot. With no slot given,
    * recurses over ALL unbound input slots (reference behavior,
    * mldagbase.py:1753-1761); name collisions against other nodes' inputs are
    * disambiguated with a `_{node.name}` suffix (observable as
    * 'arg1_test_foo1' in /root/reference/tests/test_mldag.py:44). Idempotent
    * for an existing identical bind (mldagbase.py:1776-1780).
    */
  def setInput(node: Node, name: Option[String] = None, slot: Option[String] = None): Unit = {
    add(node)
    val slots: Seq[String] = slot match {
      case Some(s) =>
        if (!node.inputs.exists(_.name == s))
          throw new SlotException(s"node '${node.name}' has no input slot '$s'")
        Seq(s)
      case None => node.inputs
        .filter(p => p.variadic || writers(node.name, p.name) == 0 ||
          inputBinds.exists(b => b.node == node.name && b.port == p.name))
        .map(_.name)
    }
    if (slots.isEmpty)
      throw new SlotException(s"node '${node.name}' has no unbound input slots for dag input")
    slots.foreach { s =>
      val desired = name.getOrElse(s)
      val existing = inputBinds.find(b => b.node == node.name && b.port == s)
      existing match {
        case Some(b) if b.inName == desired => // idempotent
        case Some(b) =>
          throw new SlotException(
            s"slot '${node.name}.$s' already bound to dag input '${b.inName}'")
        case None =>
          val taken = inputBinds.exists(b => b.inName == desired && b.node != node.name)
          val finalName =
            if (taken && name.isEmpty) s"${desired}_${node.name}" // suffix dedup
            else desired
          val p = node.inputs.find(_.name == s).get
          if (!p.variadic && writers(node.name, s) > 0)
            throw new SlotException(s"input slot '${node.name}.$s' already has a writer")
          inputBinds += InputBind(finalName, node.name, s)
      }
    }
  }

  /** Declare a DAG output fed from a node output slot; single-output inference;
    * duplicate names rejected (reference set_output, mldagbase.py:1660-1703).
    */
  def setOutput(name: String, node: Node, slot: Option[String] = None): Unit = {
    add(node)
    val s = slot match {
      case Some(x) =>
        if (!node.outputs.exists(_.name == x))
          throw new SlotException(s"node '${node.name}' has no output slot '$x'")
        x
      case None => node.outputs match {
        case Seq(only) => only.name
        case _ => throw new SlotException(
          s"cannot infer output slot of '${node.name}' for dag output '$name'")
      }
    }
    if (outputBinds.contains(name))
      throw new SlotException(s"dag output '$name' already declared")
    outputBinds(name) = (node.name, s)
  }

  def removeInput(name: String): Unit = {
    val before = inputBinds.size
    inputBinds.filterInPlace(_.inName != name)
    if (inputBinds.size == before) throw new GraftException(s"no dag input '$name'")
  }
  def removeOutput(name: String): Unit =
    if (outputBinds.remove(name).isEmpty) throw new GraftException(s"no dag output '$name'")

  /** `dag >> node`: expose every unbound required input of `node` as a DAG
    * input (reference MLDagBase.__rshift__, mldagbase.py:1381-1409). Returns
    * the node for chaining.
    */
  def >>(n: Node): n.type = { setInput(n); n }

  /** Human-readable summary — the discoverability role the reference's
    * generated fit/transform docstrings played (tests/test_mldag_doc.py:
    * "i_X : Downstream node - foo"); ports, their bindings, and the node
    * roster in topo order. The machinery itself (signature synthesis,
    * numpydoc regeneration) is dropped by design — SURVEY §2.1 #24.
    */
  def describe: String = {
    val sb = new StringBuilder(s"dag '$dagName'\n")
    sb ++= "inputs:\n"
    inputBinds.foreach(b => sb ++= s"  ${b.inName} : downstream node - ${b.node} (port ${b.port})\n")
    sb ++= "outputs:\n"
    outputBinds.foreach { case (o, (n, p)) => sb ++= s"  $o : output of $n (port $p)\n" }
    sb ++= "nodes (topo order):\n"
    topoOrder.foreach { n =>
      val ins = n.inputs.map(p => p.name +
        (if (p.keyed) "**" else if (p.variadic) "*" else "")).mkString(", ")
      sb ++= s"  ${n.name} (${n.getClass.getSimpleName}): [$ins] -> [${n.outputs.map(_.name).mkString(", ")}]\n"
    }
    sb.toString
  }

  /** Nest this dag as a node in another dag (reference as_node(dag) → MLDagNode). */
  def asNode: SubDagNode = new SubDagNode(this, Naming.snake(dagName))

  def addListener(l: NodeListener): Unit = listeners += l

  // ------------------------------------------------------------------
  // structure: topo order, cycle check, validation
  // ------------------------------------------------------------------
  /** Kahn's algorithm over data edges AND order-only dependencies, stable in
    * node-insertion order — the reference's dependency-aware width-first walk
    * (/root/reference/mldag/mldag.py:394-459) without the O(V^2 E) rescans.
    */
  def topoOrder: Seq[Node] = {
    deps.foreach { case (a, b) =>
      if (!nodeMap.contains(a)) throw new GraftException(s"dependency on unknown node '$a' (needed by '$b')")
    }
    val preds: Map[String, Seq[String]] =
      (edges.map(e => (e.to, e.from)) ++ deps.map { case (a, b) => (b, a) })
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val inDeg = mutable.Map[String, Int]() ++ nodeMap.keys.map(k => k -> preds.getOrElse(k, Nil).size)
    val succs: Map[String, Seq[String]] =
      (edges.map(e => (e.from, e.to)) ++ deps).groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val order = mutable.ArrayBuffer[String]()
    val ready = mutable.Queue[String]() ++ nodeMap.keys.filter(inDeg(_) == 0)
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      order += n
      succs.getOrElse(n, Nil).foreach { s =>
        inDeg(s) -= 1
        if (inDeg(s) == 0) ready += s
      }
    }
    if (order.size != nodeMap.size) {
      val stuck = nodeMap.keys.filterNot(order.contains).mkString(", ")
      throw new CycleException(s"dag '$dagName' has a cycle among: $stuck")
    }
    order.map(nodeMap).toSeq
  }

  def roots: Seq[Node] = {
    val hasIn = edges.map(_.to).toSet ++ deps.map(_._2)
    nodes.filterNot(n => hasIn(n.name))
  }
  def leaves: Seq[Node] = {
    val hasOut = edges.map(_.from).toSet
    nodes.filterNot(n => hasOut(n.name))
  }

  /** Build-time validation: cycles, every required non-variadic input has
    * exactly one writer (edge or dag input). */
  def validate(): Unit = {
    topoOrder
    nodes.foreach { n =>
      n.inputs.foreach { p =>
        val w = writers(n.name, p.name)
        if (p.required && !p.variadic && w == 0)
          throw new SlotException(s"input slot '${n.name}.${p.name}' has no writer and no dag input")
      }
    }
  }

  // ------------------------------------------------------------------
  // execution (reference MLDag.fit/transform, mldag.py:523-599)
  // ------------------------------------------------------------------
  /** Train run: per node in topo order, fit then transform; leaf nodes are NOT
    * transformed (their outputs are unused during fit — reference
    * mldag.py:343-345,380). Estimator fits are the only eager steps.
    */
  def fit(ctx: Ctx, bindings: Map[String, DataFrame] = Map.empty): DagRun =
    fitSeq(ctx, bindings.map { case (k, v) => k -> Seq(v) })
  def fitSeq(ctx: Ctx, bindings: Map[String, Seq[DataFrame]]): DagRun =
    run(ctx, tagBindings(bindings), doFit = true, transformLeaves = false)

  /** Inference run over previously fitted nodes; leaves included
    * (mldag.py:561-599). Pure lazy DataFrame composition.
    */
  def transform(ctx: Ctx, bindings: Map[String, DataFrame] = Map.empty): DagRun =
    transformSeq(ctx, bindings.map { case (k, v) => k -> Seq(v) })
  def transformSeq(ctx: Ctx, bindings: Map[String, Seq[DataFrame]]): DagRun =
    run(ctx, tagBindings(bindings), doFit = false, transformLeaves = true)

  /** Tagged entry points: nested dags (SubDagNode) forward payloads with
    * their ORIGINAL upstream origin names so keyed-port semantics (names,
    * duplicate rejection) behave identically nested or flat. */
  private[dag] def fitTagged(ctx: Ctx, b: Map[String, Seq[(String, DataFrame)]]): DagRun =
    run(ctx, b, doFit = true, transformLeaves = false)
  private[dag] def transformTagged(ctx: Ctx, b: Map[String, Seq[(String, DataFrame)]]): DagRun =
    run(ctx, b, doFit = false, transformLeaves = true)

  /** Untagged payloads get their bind name as origin (positional suffix only
    * when one name carries several payloads). */
  private def tagBindings(b: Map[String, Seq[DataFrame]]): Map[String, Seq[(String, DataFrame)]] =
    b.map { case (k, v) =>
      k -> v.zipWithIndex.map { case (df, i) => (if (v.size == 1) k else s"$k$i", df) }
    }

  def fitTransform(ctx: Ctx, bindings: Map[String, DataFrame] = Map.empty): DagRun = {
    fit(ctx, bindings); transform(ctx, bindings)
  }

  private def run(
      ctx: Ctx,
      bindings: Map[String, Seq[(String, DataFrame)]],
      doFit: Boolean,
      transformLeaves: Boolean): DagRun = {
    validate()
    val known = inputNames.toSet
    val unknown = bindings.keySet.diff(known)
    if (unknown.nonEmpty)
      throw new BindingException(
        s"unknown dag input(s): ${unknown.mkString(", ")} (declared: ${known.mkString(", ")})")
    // inputs with a declared default and no explicit binding resolve to the
    // default payload (reference mldagbase.py:1970-1980); explicit wins
    val defaulted: Map[String, Seq[(String, DataFrame)]] =
      inputDefaults.view.filterKeys(k => known(k) && !bindings.contains(k))
        .map { case (k, f) => k -> Seq((k, f(ctx))) }.toMap
    val bound = bindings ++ defaulted
    val missing = known.diff(bound.keySet)
    if (missing.nonEmpty)
      throw new BindingException(s"missing dag input(s): ${missing.mkString(", ")}")

    // consumers per (node, outPort) for the fan-out persist rule
    val consumerCount: Map[(String, String), Int] =
      edges.groupBy(e => (e.from, e.fromPort)).view.mapValues(_.size).toMap
    val isDagOutput: Set[(String, String)] = outputBinds.values.toSet

    val nodeOutputs = mutable.LinkedHashMap[String, Map[String, DataFrame]]()
    val hasDownstreamEdge = edges.map(_.from).toSet
    // Active listeners = enclosing runs' (outer-first) + this dag's own; a
    // SubDagNode's inner run picks these up via the shared Ctx, so an outer
    // TimingListener times inner nodes too. Saved/restored around the run.
    val activeListeners: Seq[NodeListener] =
      ctx.inheritedListeners ++ listeners.filterNot(ctx.inheritedListeners.contains)
    val prevInherited = ctx.inheritedListeners
    ctx.inheritedListeners = activeListeners
    ctx.runDepth += 1
    try {
      activeListeners.foreach(_.onRunStart(ctx.runId, this))
      topoOrder.foreach { n =>
        // gather inputs: dag binds first (bind order), then edges (insertion
        // order); each payload is tagged with its origin name, and keyed
        // variadic ports reject duplicate origins (reference duplicate-kwarg
        // error, _handle_var_key, mldag.py:150-155)
        val acc = mutable.LinkedHashMap[String, mutable.ArrayBuffer[(String, DataFrame)]]()
        val keyedPorts = n.inputs.filter(_.keyed).map(_.name).toSet
        def put(port: String, origin: String, df: DataFrame): Unit = {
          val buf = acc.getOrElseUpdate(port, mutable.ArrayBuffer())
          if (keyedPorts(port) && buf.exists(_._1 == origin))
            throw new SlotException(
              s"duplicate keyed payload '$origin' for port '${n.name}.$port'")
          buf += ((origin, df))
        }
        inputBinds.filter(_.node == n.name).foreach { b =>
          bound.get(b.inName).foreach(_.foreach { case (origin, df) => put(b.port, origin, df) })
        }
        edges.filter(_.to == n.name).foreach { e =>
          nodeOutputs.get(e.from).flatMap(_.get(e.fromPort)).foreach { df =>
            put(e.toPort, e.from, df)
          }
        }
        val in = In.tagged(acc.map { case (k, v) => k -> v.toSeq }.toMap)
        try {
          if (doFit) {
            activeListeners.foreach(_.beforeFit(n, ctx))
            n.fit(ctx, in)
            activeListeners.foreach(_.afterFit(n, ctx))
          }
          val isLeaf = !hasDownstreamEdge(n.name)
          if (transformLeaves || !isLeaf) {
            activeListeners.foreach(_.beforeTransform(n, ctx))
            val rawOut = n.transform(ctx, in)
            activeListeners.foreach(_.afterTransform(n, ctx))
            val declared = n.outputs.map(_.name).toSet
            val undeclared = rawOut.keySet.diff(declared)
            if (undeclared.nonEmpty)
              throw new SlotException(
                s"node '${n.name}' emitted undeclared output(s): ${undeclared.mkString(", ")}")
            val out = rawOut.map { case (p, df) =>
              val nConsumers = consumerCount.getOrElse((n.name, p), 0) +
                (if (isDagOutput((n.name, p))) 1 else 0)
              if (persistAtFanout && nConsumers >= 2 && n.persistableOutput) {
                df.persist(fanoutStorageLevel)
                // registered on the shared Ctx (not a run-local buffer): a
                // NESTED run's DagRun is discarded by SubDagNode, so its
                // persists must surface in the OUTERMOST run's DagRun — the
                // queue drains there (see below)
                ctx.internalPersists.add(df)
                p -> df
              } else p -> df
            }
            nodeOutputs(n.name) = out
          }
        } catch {
          case e: GraftException => throw e
          case e: Throwable =>
            throw new GraftException(s"error executing node '${n.name}': ${e.getMessage}", e)
        }
      }
    } finally {
      ctx.runDepth -= 1
      ctx.inheritedListeners = prevInherited
      activeListeners.foreach(_.onRunEnd(ctx.runId, this))
    }

    val outs = outputBinds.flatMap { case (oname, (nname, port)) =>
      nodeOutputs.get(nname).flatMap(_.get(port)).map(oname -> _)
    }.toMap
    // The OUTERMOST TRANSFORM run DRAINS the shared persist queue (fan-out
    // persists + Ctx.track internals, including everything nested runs
    // added): each top-level transform's DagRun owns exactly its own
    // run-tree's persists, so a Ctx reused across runs neither accumulates
    // entries forever nor lets a later run's unpersist() evict an earlier
    // run's caches. Fit runs SNAPSHOT without draining: the idiomatic
    // `d.fit(ctx); d.transform(ctx)` discards the fit DagRun, so fit-phase
    // persists must stay queued for the transform's drain — but a fit-ONLY
    // caller (fit-to-serialize workflows) still gets a releasable handle,
    // and double-unpersist of a frame is a harmless no-op. Nested runs hand
    // back an empty list — SubDagNode discards their DagRun anyway.
    val owned =
      if (ctx.runDepth > 0) Nil
      else if (doFit) ctx.internalPersists.toArray(Array.empty[DataFrame]).toSeq
      else {
        val buf = mutable.ArrayBuffer[DataFrame]()
        var df = ctx.internalPersists.poll()
        while (df != null) { buf += df; df = ctx.internalPersists.poll() }
        buf.toSeq
      }
    DagRun(ctx.runId, outs, nodeOutputs.toMap, owned)
  }
}

object Dag {
  def apply(name: String = "dag"): Dag = new Dag(name)

  /** Resolve the owning dag from either endpoint and connect — graph
    * membership propagates on wiring (reference VertexBase._set_relationship,
    * graph.py:80-127).
    */
  private[dag] def connect(up: Node, upSlot: Option[String], down: Node, downSlot: Option[String]): Unit = {
    val dag = (up.attached, down.attached) match {
      case (Some(a), Some(b)) if a eq b => a
      case (Some(a), Some(b)) =>
        throw new GraftException(
          s"nodes '${up.name}' (dag '${a.dagName}') and '${down.name}' (dag '${b.dagName}') belong to different dags")
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        throw new GraftException(
          s"neither '${up.name}' nor '${down.name}' is attached to a dag; add one first (dag.add / dag >> node)")
    }
    dag.connect(up, upSlot, down, downSlot)
  }
}

/** Run artifact (reference `MLDagRun`, mldag.py:81-97): DAG outputs plus every
  * node's outputs, all still-lazy DataFrames. `unpersist()` releases fan-out
  * caches after the caller's actions complete.
  */
final case class DagRun(
    runId: String,
    outputs: Map[String, DataFrame],
    nodeOutputs: Map[String, Map[String, DataFrame]],
    persisted: Seq[DataFrame]) {
  def apply(output: String): DataFrame =
    outputs.getOrElse(output, throw new GraftException(
      s"run has no output '$output' (has: ${outputs.keys.mkString(", ")})"))
  def unpersist(): Unit = persisted.foreach(_.unpersist())
  /** Formatted physical plan of an output — the audit hook behind PlanSpec:
    * the whole dag fuses into one Catalyst plan per output, and this is it. */
  def explain(output: String): String =
    apply(output).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
}

/** Per-node lifecycle hooks (reference mixins `_wrap_fit/_wrap_transform`,
  * mldagbase.py:1290-1326) — timing, lineage, caching policy.
  */
trait NodeListener {
  def onRunStart(runId: String, dag: Dag): Unit = ()
  def onRunEnd(runId: String, dag: Dag): Unit = ()
  def beforeFit(n: Node, ctx: Ctx): Unit = ()
  def afterFit(n: Node, ctx: Ctx): Unit = ()
  def beforeTransform(n: Node, ctx: Ctx): Unit = ()
  def afterTransform(n: Node, ctx: Ctx): Unit = ()
}

/** Bridge to Spark's QueryExecutionListener: per-ACTION wall time and row
  * counts as Spark reports them (the complement of TimingListener, which sees
  * only plan-composition time under lazy evaluation — reference mixins wrap
  * eager per-node calls, so one hook sufficed there; here the real work
  * happens at action time inside Spark).
  */
final case class ActionMetric(funcName: String, durationNs: Long, outputRows: Option[Long])

final class SparkMetricsListener extends org.apache.spark.sql.util.QueryExecutionListener {
  val actions = new java.util.concurrent.ConcurrentLinkedQueue[ActionMetric]()
  override def onSuccess(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
    val rows = Option(qe.executedPlan.metrics.get("numOutputRows")).flatten.map(_.value)
    actions.add(ActionMetric(funcName, durationNs, rows))
  }
  override def onFailure(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
    actions.add(ActionMetric(s"$funcName!failed", -1L, None))
  def attach(spark: org.apache.spark.sql.SparkSession): this.type = {
    spark.listenerManager.register(this); this
  }
  def detach(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.listenerManager.unregister(this)
}

/** Built-in wall-clock listener. Note: transforms are lazy, so transform time
  * here measures plan-composition cost; real work shows up in Spark's
  * QueryExecutionListener at action time (SparkMetricsListener).
  *
  * Reentrant: listener propagation into nested dags means a SubDagNode's
  * before/after pair ENCLOSES its inner nodes' pairs, so start times live on
  * a stack (events nest strictly), not a single shared slot — with one slot
  * the subdag would report the LAST inner node's duration as its own.
  */
final class TimingListener extends NodeListener {
  val fitNanos = mutable.LinkedHashMap[String, Long]()
  val transformNanos = mutable.LinkedHashMap[String, Long]()
  private val starts = mutable.Stack[Long]()
  /** Keys are `dagName.nodeName`: with listener propagation an inner dag's
    * node may share its bare name with an outer one, and bare-name keys
    * would silently overwrite across levels. (Same-named sibling DAGs can
    * still collide — name nested dags distinctly when timing matters.) */
  private def key(n: Node): String =
    n.attached.map(d => s"${d.dagName}.").getOrElse("") + n.name
  override def beforeFit(n: Node, ctx: Ctx): Unit = starts.push(System.nanoTime())
  override def afterFit(n: Node, ctx: Ctx): Unit = fitNanos(key(n)) = System.nanoTime() - starts.pop()
  override def beforeTransform(n: Node, ctx: Ctx): Unit = starts.push(System.nanoTime())
  override def afterTransform(n: Node, ctx: Ctx): Unit = transformNanos(key(n)) = System.nanoTime() - starts.pop()
}
