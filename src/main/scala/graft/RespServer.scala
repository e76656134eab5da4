package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Embedded RESP2 server: the command subset the Redis control plane
  * ([[RedisControlPlane]]) speaks — strings (with NX/PX options), hashes,
  * lists, KEYS — over real sockets with the real wire protocol.
  *
  * Two roles:
  *   1. Spec harness: RedisControlPlaneSpec runs the API-node/worker-node
  *      split against this server, so the RESP client, the key scripts and
  *      the claim/retry/cancel semantics are proven over an actual TCP
  *      round-trip (the sandbox ships no Redis).
  *   2. Single-node deployment stand-in: a fleet that wants the network
  *      control plane without operating Redis can run this next to the API
  *      node (`graft.RespServer.start(port)`) — the same role the file
  *      plane's shared directory plays, network-accessible.
  *
  * Concurrency model: one global mutex around every command — exactly
  * Redis's single-threaded execution semantics (each command atomic, no
  * interleaving inside a command), which is the property the control
  * plane's admission lock and RPOP claim rely on. Throughput is not the
  * point here; correctness of the protocol conversation is.
  *
  * PX expiry is lazy: expired keys are dropped on access — sufficient for
  * the control plane's lock keys (the only TTL'd keys it writes).
  */
final class RespServer(port: Int = 0) {
  private val server = new ServerSocket(port, 64, java.net.InetAddress.getLoopbackAddress)
  @volatile private var stopped = false
  // Live client sockets, closed on stop(): real Redis drops client
  // connections at shutdown; leaving them half-alive lets a client read
  // stale state from a "dead" server (the failover-stale-read race).
  private val conns = mutable.Set.empty[Socket]

  private val lock = new Object
  private val strings = mutable.Map.empty[String, String]
  private val expiries = mutable.Map.empty[String, Long] // absolute millis
  private val hashes = mutable.Map.empty[String, mutable.Map[String, String]]
  private val lists = mutable.Map.empty[String, mutable.ArrayDeque[String]]

  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (!stopped) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s), "graft-resp-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // closed
    }
  }, "graft-resp-accept")
  acceptor.setDaemon(true)

  def start(): RespServer = { acceptor.start(); this }

  def stop(): Unit = {
    stopped = true
    try server.close() catch { case _: Exception => () }
    conns.synchronized {
      conns.foreach(s => try s.close() catch { case _: Exception => () })
      conns.clear()
    }
  }

  // ------------------------------------------------------------ protocol
  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    conns.synchronized { conns += sock }
    if (stopped) { try sock.close() catch { case _: Exception => () }; return }
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      var open = true
      while (open && !stopped) {
        readCommand(in) match {
          case None => open = false
          case Some(args) if args.nonEmpty &&
              args.head.equalsIgnoreCase("QUIT") =>
            write(out, "+OK\r\n"); open = false
          case Some(args) =>
            val reply = try lock.synchronized(dispatch(args))
            catch { case e: Exception => s"-ERR ${e.getMessage}\r\n" }
            write(out, reply)
        }
      }
    } catch { case _: Exception => () }
    finally {
      try sock.close() catch { case _: Exception => () }
      conns.synchronized { conns -= sock }
    }
  }

  private def write(out: BufferedOutputStream, s: String): Unit = {
    out.write(s.getBytes(StandardCharsets.UTF_8)); out.flush()
  }

  private def readLine(in: BufferedInputStream): String = {
    val sb = new java.lang.StringBuilder()
    var c = in.read()
    if (c < 0) return null
    while (c != '\r') {
      // EOF mid-line: a client that disconnected mid-command must not pin
      // this thread in a read()== -1 busy loop with an unbounded buffer.
      if (c < 0) throw new java.io.EOFException("client closed mid-line")
      sb.append(c.toChar); c = in.read()
    }
    in.read() // \n
    sb.toString
  }

  /** Clients send commands as RESP arrays of bulk strings. */
  private def readCommand(in: BufferedInputStream): Option[Seq[String]] = {
    val first = in.read()
    if (first < 0) return None
    require(first == '*', s"expected array, got ${first.toChar}")
    val n = readLine(in).toInt
    Some((0 until n).map { _ =>
      require(in.read() == '$', "expected bulk string")
      val len = readLine(in).toInt
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val r = in.read(buf, off, len - off)
        require(r >= 0, "eof mid-bulk")
        off += r
      }
      in.read(); in.read() // \r\n
      new String(buf, StandardCharsets.UTF_8)
    })
  }

  // ------------------------------------------------------------ replies
  private def bulk(s: String): String =
    if (s == null) "$-1\r\n"
    else s"$$${s.getBytes(StandardCharsets.UTF_8).length}\r\n$s\r\n"
  private def int(n: Long): String = s":$n\r\n"
  private def arr(xs: Seq[String]): String =
    s"*${xs.length}\r\n" + xs.map(bulk).mkString

  // ------------------------------------------------------------ commands
  private def dropExpired(key: String): Unit =
    expiries.get(key).foreach { at =>
      if (System.currentTimeMillis >= at) {
        expiries.remove(key); strings.remove(key)
        hashes.remove(key); lists.remove(key): Unit
      }
    }

  private def exists(key: String): Boolean = {
    dropExpired(key)
    strings.contains(key) || hashes.contains(key) || lists.contains(key)
  }

  private def delKey(key: String): Boolean = {
    dropExpired(key)
    val had = exists(key)
    strings.remove(key); hashes.remove(key); lists.remove(key)
    expiries.remove(key)
    had
  }

  private def dispatch(args: Seq[String]): String = args.head.toUpperCase match {
    case "PING" => "+PONG\r\n"
    case "FLUSHALL" =>
      strings.clear(); hashes.clear(); lists.clear(); expiries.clear(); "+OK\r\n"

    case "SET" =>
      val (key, value) = (args(1), args(2))
      dropExpired(key)
      var nx = false
      var px = -1L
      var i = 3
      while (i < args.length) {
        args(i).toUpperCase match {
          case "NX" => nx = true; i += 1
          case "PX" => px = args(i + 1).toLong; i += 2
          case o => throw new IllegalArgumentException(s"SET option $o")
        }
      }
      if (nx && exists(key)) "$-1\r\n"
      else {
        hashes.remove(key); lists.remove(key)
        strings(key) = value
        if (px > 0) expiries(key) = System.currentTimeMillis + px
        else expiries.remove(key)
        "+OK\r\n"
      }
    case "GET" => dropExpired(args(1)); bulk(strings.get(args(1)).orNull)
    case "DEL" => int(args.tail.count(delKey))
    case "EXISTS" => int(args.tail.count(exists))
    case "INCR" =>
      dropExpired(args(1))
      val next = strings.get(args(1)).map(_.toLong).getOrElse(0L) + 1
      strings(args(1)) = next.toString
      int(next)

    case "HSET" =>
      dropExpired(args(1))
      val h = hashes.getOrElseUpdate(args(1), mutable.Map.empty)
      var added = 0L
      args.drop(2).grouped(2).foreach { p =>
        if (!h.contains(p.head)) added += 1
        h(p.head) = p(1)
      }
      int(added)
    case "HGET" =>
      dropExpired(args(1))
      bulk(hashes.get(args(1)).flatMap(_.get(args(2))).orNull)
    case "HGETALL" =>
      dropExpired(args(1))
      arr(hashes.get(args(1)).map(_.toSeq.sortBy(_._1)
        .flatMap(kv => Seq(kv._1, kv._2))).getOrElse(Nil))
    case "HDEL" =>
      dropExpired(args(1))
      val h = hashes.get(args(1))
      int(h.map(m => args.drop(2).count(m.remove(_).isDefined).toLong).getOrElse(0L))

    case "LPUSH" =>
      dropExpired(args(1))
      val l = lists.getOrElseUpdate(args(1), mutable.ArrayDeque.empty)
      args.drop(2).foreach(l.prepend)
      int(l.size)
    case "RPUSH" =>
      dropExpired(args(1))
      val l = lists.getOrElseUpdate(args(1), mutable.ArrayDeque.empty)
      args.drop(2).foreach(l.append)
      int(l.size)
    case "RPOP" =>
      dropExpired(args(1))
      lists.get(args(1)) match {
        case Some(l) if l.nonEmpty =>
          val v = l.removeLast()
          if (l.isEmpty) lists.remove(args(1))
          bulk(v)
        case _ => "$-1\r\n"
      }
    case "LPOP" =>
      dropExpired(args(1))
      lists.get(args(1)) match {
        case Some(l) if l.nonEmpty =>
          val v = l.removeHead()
          if (l.isEmpty) lists.remove(args(1))
          bulk(v)
        case _ => "$-1\r\n"
      }
    case "LINDEX" =>
      dropExpired(args(1))
      val l = lists.getOrElse(args(1), mutable.ArrayDeque.empty)
      val n = l.size
      val i = { val r = args(2).toInt; if (r < 0) n + r else r }
      bulk(if (i >= 0 && i < n) l(i) else null)
    case "LMOVE" | "RPOPLPUSH" =>
      // LMOVE src dst LEFT|RIGHT LEFT|RIGHT (Redis ≥ 6.2); RPOPLPUSH is
      // the legacy spelling of LMOVE src dst RIGHT LEFT. Atomic under the
      // command mutex like every other command — which is exactly what
      // makes it the reliable-queue claim: pop and park are one step, so
      // a reply lost with the socket leaves the payload IN the
      // destination list instead of nowhere.
      val (src, dst) = (args(1), args(2))
      val (from, to) =
        if (args.head.toUpperCase == "RPOPLPUSH") ("RIGHT", "LEFT")
        else (args(3).toUpperCase, args(4).toUpperCase)
      dropExpired(src); dropExpired(dst)
      lists.get(src) match {
        case Some(l) if l.nonEmpty =>
          val v = if (from == "LEFT") l.removeHead() else l.removeLast()
          if (l.isEmpty) lists.remove(src)
          val d = lists.getOrElseUpdate(dst, mutable.ArrayDeque.empty)
          if (to == "LEFT") d.prepend(v) else d.append(v)
          bulk(v)
        case _ => "$-1\r\n"
      }
    case "LLEN" =>
      dropExpired(args(1)); int(lists.get(args(1)).map(_.size.toLong).getOrElse(0L))
    case "LRANGE" =>
      dropExpired(args(1))
      val l = lists.getOrElse(args(1), mutable.ArrayDeque.empty)
      val n = l.size
      def idx(raw: String): Int = { val i = raw.toInt; if (i < 0) n + i else i }
      val from = math.max(0, idx(args(2)))
      val to = math.min(n - 1, idx(args(3)))
      arr(if (from > to) Nil else (from to to).map(l(_)))
    case "LREM" =>
      dropExpired(args(1))
      val count = args(2).toInt
      require(count >= 0, "LREM negative count unsupported")
      lists.get(args(1)) match {
        case Some(l) =>
          val before = l.size
          val limit = if (count == 0) Int.MaxValue else count
          var removed = 0
          val kept = l.filter { v =>
            if (v == args(3) && removed < limit) { removed += 1; false } else true
          }
          l.clear(); kept.foreach(l.append)
          if (l.isEmpty) lists.remove(args(1))
          int(before - kept.size)
        case None => int(0)
      }

    case "KEYS" =>
      val regex = java.util.regex.Pattern.quote(args(1))
        .replace("*", "\\E.*\\Q").r
      val all = (strings.keys ++ hashes.keys ++ lists.keys).toSeq.distinct
      arr(all.filter(k => { dropExpired(k); exists(k) && regex.matches(k) }).sorted)

    case other => throw new IllegalArgumentException(s"unknown command '$other'")
  }
}
