package graft.sd

/** Service-discovery seam: nginx-upsync-style node registration in a
  * consul-compatible KV tree, after the reference's `sd` package
  * (`sd/register.go`, `sd/nginx/nginx.go`).
  *
  * The reference registers each backend under
  * `upstreams/{namespace}/{dc|_}/{hostname}/{ip}{port}` with a JSON
  * body nginx's upsync module consumes (`{"weight":N,"max_fails":0}`,
  * backup DCs `{"backup":1,"max_fails":0}`) and the registration
  * timestamp in the KV flags. The KV transport is abstracted behind
  * [[KvStore]] so the engine logic (key layout, weight bodies, backup
  * fan-out, stale-node clearing, expiry) is testable without a consul
  * — and a deployment can plug an HTTP implementation against any
  * consul-compatible endpoint.
  */
final case class KV(key: String, value: String, flags: Long)

/** Minimal consul-KV contract: `put`/`delete` take paths relative to
  * the namespace root; `list` returns the recursive listing with
  * ABSOLUTE keys (as consul does — relative to the KV mount, so they
  * include the `upstreams/{namespace}/` prefix).
  */
trait KvStore {
  def put(relPath: String, body: String, flags: Long): Either[String, Unit]
  def delete(relPath: String): Either[String, Unit]
  def list(): Either[String, Seq[KV]]
}

/** In-memory [[KvStore]] mirroring consul's key model — the test
  * double, and a usable single-process registry.
  */
final class InMemoryKvStore(root: String) extends KvStore {
  private val data = scala.collection.mutable.LinkedHashMap[String, (String, Long)]()
  private def abs(rel: String): String = root + rel
  def put(relPath: String, body: String, flags: Long): Either[String, Unit] =
    synchronized { data(abs(relPath)) = (body, flags); Right(()) }
  def delete(relPath: String): Either[String, Unit] =
    synchronized { data.remove(abs(relPath)); Right(()) }
  def list(): Either[String, Seq[KV]] =
    synchronized { Right(data.toSeq.map { case (k, (v, f)) => KV(k, v, f) }) }
}

/** Node registration/cleanup logic of the reference's nginx SD
  * (`sd/nginx/nginx.go:51-460`), minus the HTTP transport.
  */
final class NginxSd(
    store: KvStore,
    namespace0: String,
    val hostname: String,
    now: () => Long = () => System.currentTimeMillis() / 1000L) {

  /** Empty namespace defaults to `graphite` (`nginx.go:66-68`). */
  val namespace: String = if (namespace0.isEmpty) "graphite" else namespace0

  /** Listing keys are absolute; this is the prefix they must carry
    * (`nginx.go:75` `nsEnd`).
    */
  val nsEnd: String = s"upstreams/$namespace/"

  private def body(weight: Long): String =
    s"""{"weight":${math.max(weight, 1L)},"max_fails":0}"""
  private val backupBody = """{"backup":1,"max_fails":0}"""

  /** `dc/host/listen` from a relative node key (`nginx.go:32-49`):
    * exactly three segments.
    */
  def splitNode(node: String): Option[(String, String, String)] =
    node.split("/", -1) match {
      case Array(dc, host, listen) => Some((dc, host, listen))
      case _ => None
    }

  /** Register this host: no DCs → one `_/{host}/{ip}{port}` record
    * with the weight body; with DCs the first is primary and the rest
    * register as backups (`nginx.go:276-342`). Flags carry the
    * registration time for expiry cleanup.
    */
  def update(ip: String, port: String, dcs: Seq[String], weight: Long): Either[String, Unit] = {
    val flags = now()
    if (dcs.isEmpty) store.put(s"_/$hostname/$ip$port", body(weight), flags)
    else dcs.zipWithIndex.foldLeft(Right(()): Either[String, Unit]) {
      case (acc, (dc, i)) =>
        val b = if (i == 0) body(weight) else backupBody
        store.put(s"$dc/$hostname/$ip$port", b, flags) match {
          case l @ Left(_) => l
          case _ => acc
        }
    }
  }

  /** Delete this host's records for one listen address
    * (`nginx.go:361-404`).
    */
  def delete(ip: String, port: String, dcs: Seq[String]): Either[String, Unit] =
    if (dcs.isEmpty) store.delete(s"_/$hostname/$ip$port")
    else dcs.foldLeft(Right(()): Either[String, Unit]) { (acc, dc) =>
      store.delete(s"$dc/$hostname/$ip$port") match {
        case l @ Left(_) => l
        case _ => acc
      }
    }

  /** Delete one relative node key verbatim (`nginx.go:350-359`). */
  def deleteNode(node: String): Either[String, Unit] = store.delete(node)

  /** All records in the namespace, keys relativized — every hostname,
    * for operator tooling and expiry (`nginx.go:223-274`).
    */
  def nodes(): Either[String, Seq[KV]] =
    store.list().flatMap { kvs =>
      kvs.foldLeft(Right(Vector.empty[KV]): Either[String, Vector[KV]]) {
        case (l @ Left(_), _) => l
        case (Right(acc), kv) =>
          if (kv.key.startsWith(nsEnd))
            Right(acc :+ kv.copy(key = kv.key.stripPrefix(nsEnd)))
          else Left(s"list key '$nsEnd' is invalid: '${kv.key}'")
      }
    }

  /** This hostname's relative node keys (`nginx.go:110-153`). */
  def list(): Either[String, Seq[String]] =
    nodes().map(_.map(_.key).filter(k =>
      splitNode(k).exists(_._2 == hostname)))

  /** This hostname's records as key → body (`nginx.go:155-221`). */
  def listMap(): Either[String, Map[String, String]] =
    nodes().map(_.filter(kv => splitNode(kv.key).exists(_._2 == hostname))
      .map(kv => kv.key -> kv.value).toMap)

  /** Drop every record of this hostname except the current listen
    * address — the restart-cleanup pass (`nginx.go:406-460`).
    */
  def clear(preserveIP: String, preservePort: String): Either[String, Unit] =
    list().flatMap { ns =>
      val preserve = preserveIP + preservePort
      ns.foldLeft(Right(()): Either[String, Unit]) { (acc, node) =>
        splitNode(node) match {
          case Some((_, host, listen)) if host == hostname && listen != preserve =>
            store.delete(node) match {
              case l @ Left(_) => l
              case _ => acc
            }
          case _ => acc
        }
      }
    }

  /** Expiry sweep (`sd/register.go:139-171` `Cleanup`): delete every
    * node (any hostname) whose flags timestamp is older than
    * `expireSec`; returns the deleted keys. Records with zero flags
    * are never expired (pre-flags registrations).
    */
  def expire(expireSec: Long): Either[String, Seq[String]] = {
    val cutoff = now() - expireSec
    nodes().flatMap { ns =>
      ns.filter(kv => kv.flags > 0 && cutoff > kv.flags)
        .foldLeft(Right(Vector.empty[String]): Either[String, Vector[String]]) {
          case (l @ Left(_), _) => l
          case (Right(acc), kv) => deleteNode(kv.key).map(_ => acc :+ kv.key)
        }
    }
  }
}
