package graft.observe

/** Structured observability events — the engine-side analog of the
  * reference's qortex-observe package (emitter.py:21-24 `emit`,
  * events.py event dataclasses, tracing.py `traced`).
  *
  * Scope: the reference exports to OTel/Prometheus; those transports are
  * out of scope here (SURVEY §2.10). What IS engine behavior — every
  * learner/service call emitting a typed event, no-op when unconfigured —
  * is re-expressed with a driver-side bus and two sinks (bounded
  * in-memory ring for tests/inspection, JSONL file for pipelines). Events
  * are CONTROL-PLANE (one per service/learner call, like the reference),
  * never per-row — data-plane metrics stay in the lineage/metrics tables.
  */
object Observe {

  /** One structured event: type name + flat payload. Mirrors the
    * reference's dataclass events (events.py) without one class per
    * type — the payload keys match the reference's field names at each
    * emit site.
    */
  final case class Event(eventType: String, fields: Map[String, Any])

  trait Sink { def accept(e: Event): Unit }

  /** Bounded ring buffer (newest `capacity` events) — the test/inspection
    * sink; never grows unbounded under a hot service.
    */
  final class InMemorySink(capacity: Int = 1000) extends Sink {
    private val buf = new java.util.ArrayDeque[Event](capacity)
    def accept(e: Event): Unit = buf.synchronized {
      if (buf.size >= capacity) buf.removeFirst()
      buf.addLast(e)
    }
    def events: Seq[Event] = buf.synchronized {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toVector
    }
    def ofType(t: String): Seq[Event] = events.filter(_.eventType == t)
    def clear(): Unit = buf.synchronized(buf.clear())
  }

  /** Append-only JSONL sink (one JSON object per event). Driver-side,
    * control-plane volume.
    */
  final class JsonlSink(path: String) extends Sink {
    private val writer = {
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.newBufferedWriter(p,
        java.nio.charset.StandardCharsets.UTF_8,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    def accept(e: Event): Unit = synchronized {
      writer.write(toJson(e)); writer.newLine(); writer.flush()
    }
    def close(): Unit = synchronized(writer.close())
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => jsonStr(s)
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) jsonStr(d.toString) else d.toString
    case f: Float => jsonValue(f.toDouble)
    case n: Number => n.toString
    case o: Option[_] => o.map(jsonValue).getOrElse("null")
    case xs: Iterable[_] => xs.map(jsonValue).mkString("[", ",", "]")
    case other => jsonStr(String.valueOf(other))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def toJson(e: Event): String =
    s"""{"event":${jsonStr(e.eventType)}""" +
      e.fields.toSeq.sortBy(_._1)
        .map { case (k, v) => s",${jsonStr(k)}:${jsonValue(v)}" }.mkString + "}"

  // ---- the singleton emitter (emitter.py:16-24) --------------------------

  @volatile private var sink: Option[Sink] = None

  /** Configure once; emit everywhere. Unconfigured = zero-overhead no-op
    * (the reference's exact contract, emitter.py:4-5).
    */
  def configure(s: Sink): Unit = sink = Some(s)
  def reset(): Unit = sink = None
  def isConfigured: Boolean = sink.isDefined

  /** Fire-and-forget. A sink failure is swallowed (observability must
    * never fail the data path) but printed once per event type.
    */
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def emit(eventType: String, fields: (String, Any)*): Unit = emit(Event(eventType, fields.toMap))
  def emit(e: Event): Unit = sink.foreach { s =>
    try s.accept(e)
    catch {
      case ex: Throwable if warned.add(e.eventType) =>
        System.err.println(s"[graft] WARN observe sink failed for ${e.eventType}: $ex")
      case _: Throwable => ()
    }
  }

  /** tracing.py `traced`: time a body, emit `<name>.completed` with
    * duration_ms (and `<name>.failed` with the error on throw).
    */
  def traced[T](name: String, fields: (String, Any)*)(body: => T): T = {
    val t0 = System.nanoTime()
    try {
      val out = body
      emit(Event(s"$name.completed",
        fields.toMap + ("duration_ms" -> (System.nanoTime() - t0) / 1e6)))
      out
    } catch {
      case e: Throwable =>
        emit(Event(s"$name.failed",
          fields.toMap + ("duration_ms" -> (System.nanoTime() - t0) / 1e6,
            "error" -> s"${e.getClass.getSimpleName}: ${e.getMessage}")))
        throw e
    }
  }
}
