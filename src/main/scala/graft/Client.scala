package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.{Duration, LocalDateTime}
import scala.jdk.CollectionConverters._

/** Server-reported error unwrapped from the `{"status":"error","message":…}`
  * envelope (or a malformed/non-JSON response). `statusCode` is the HTTP
  * status; 0 means the response never arrived (connect/timeout). */
final class ClientException(val statusCode: Int, message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** What the server discloses about a created job — the wire mirror of the
  * reference's JobResp (`models/models.go:22-28`): creation acknowledgment
  * fields only, not the full request (args/ttl/db are not echoed back). */
final case class JobResp(
    jobId: String,
    task: String,
    queue: String,
    eta: Option[LocalDateTime],
    retries: Int)

/** Group-creation acknowledgment (GroupResp, `models/models.go:36-40`). */
final case class GroupResp(groupId: String, jobs: Seq[JobResp])

/** Remote HTTP client for a graft server — the port of the reference's
  * client SDK (`client/client.go:67-199`): one typed wrapper per route over
  * a shared transport, unwrapping the success/error envelope
  * (`models/models.go:59-63`) and surfacing server errors as exceptions.
  *
  * Zero dependencies beyond the JDK (`java.net.http.HttpClient`) and the
  * Jackson that ships with Spark, so a caller on another machine needs only
  * this library on the classpath — the in-process [[Api]] facade and this
  * client expose the same verbs against the same state machine.
  *
  * Thread-safe: `HttpClient` is immutable and shares connections.
  */
final class Client(baseUrl: String, requestTimeout: Duration = Duration.ofSeconds(30)) {
  private val base = baseUrl.stripSuffix("/")
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  // ------------------------------------------------------------- verbs
  /** GET /tasks — registered task names (client.go: GetTasks). */
  def listTasks(): Seq[String] =
    request("GET", "/tasks").elements().asScala.map(_.asText).toSeq

  /** GET /tasks?sql=1 — task name → SQL (documented deviation: the
    * reference returns SQL by default; this server opts in via ?sql=1). */
  def listTasksWithSql(): Map[String, String] = {
    val node = request("GET", "/tasks?sql=1")
    node.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
  }

  /** POST /tasks/{task}/jobs (client.go:67-73 PostJob). */
  def postJob(req: JobReq): JobResp = {
    val body = mapper.createObjectNode()
    if (req.jobId.nonEmpty) body.put("job_id", req.jobId)
    if (req.queue.nonEmpty) body.put("queue", req.queue)
    req.eta.foreach(body.put("eta", _))
    if (req.retries != 0) body.put("retries", req.retries)
    if (req.ttlSec != 0) body.put("ttl", req.ttlSec)
    req.db.foreach(body.put("db", _))
    val args = body.putArray("args")
    req.args.foreach(args.add)
    jobRespOf(request("POST", s"/tasks/${enc(req.taskName)}/jobs", Some(body)))
  }

  /** GET /jobs/{id} (client.go:75-81 GetJobStatus). */
  def getJobStatus(jobId: String): JobStatus = statusOf(request("GET", s"/jobs/${enc(jobId)}"))

  /** DELETE /jobs/{id}?purge= (client.go:83-89 DeleteJob). */
  def deleteJob(jobId: String, purge: Boolean = false): Unit =
    request("DELETE", s"/jobs/${enc(jobId)}?purge=$purge")

  /** GET /jobs/queue/{queue} (client.go:100-106 GetPendingJobs). */
  def getPendingJobs(queue: String): Seq[String] =
    request("GET", s"/jobs/queue/${enc(queue)}").elements().asScala.map(_.asText).toSeq

  /** POST /groups (client.go:108-113 PostJobGroup). */
  def postJobGroup(groupId: String, reqs: Seq[JobReq]): GroupResp = {
    val body = mapper.createObjectNode()
    if (groupId.nonEmpty) body.put("group_id", groupId)
    val arr = body.putArray("jobs")
    reqs.foreach { r =>
      val j = arr.addObject()
      j.put("task", r.taskName)
      if (r.jobId.nonEmpty) j.put("job_id", r.jobId)
      if (r.queue.nonEmpty) j.put("queue", r.queue)
      r.eta.foreach(j.put("eta", _))
      if (r.retries != 0) j.put("retries", r.retries)
      if (r.ttlSec != 0) j.put("ttl", r.ttlSec)
      r.db.foreach(j.put("db", _))
      val args = j.putArray("args")
      r.args.foreach(args.add)
    }
    val node = request("POST", "/groups", Some(body))
    GroupResp(
      groupId = node.get("group_id").asText,
      jobs = node.get("jobs").elements().asScala.map(jobRespOf).toSeq)
  }

  /** GET /groups/{id} (client.go:115-121 GetGroupStatus). */
  def getGroupStatus(groupId: String): GroupStatus = {
    val node = request("GET", s"/groups/${enc(groupId)}")
    GroupStatus(
      groupId = node.get("group_id").asText,
      state = stateOf(node.get("state").asText),
      jobs = node.get("jobs").elements().asScala.map(statusOf).toSeq)
  }

  /** DELETE /groups/{id}?purge= (client.go:91-98 DeleteGroupJob). */
  def deleteGroup(groupId: String, purge: Boolean = false): Unit =
    request("DELETE", s"/groups/${enc(groupId)}?purge=$purge")

  // --------------------------------------------------------- transport
  /** Shared transport (client.go:128-199 doHTTPReq): send, check the HTTP
    * layer, parse the envelope, return the `data` node or raise. */
  private def request(method: String, path: String, body: Option[JsonNode] = None): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(base + path)).timeout(requestTimeout)
    val req = (method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case "POST"   => b.header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body.get)))
      case other    => throw new IllegalArgumentException(s"unsupported method $other")
    }).build()
    val resp =
      try http.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new ClientException(0, s"$method $path failed: ${e.getMessage}", e)
      }
    val envelope =
      try mapper.readTree(resp.body())
      catch {
        case e: Exception => throw new ClientException(resp.statusCode(),
          s"$method $path: non-JSON response (HTTP ${resp.statusCode()})", e)
      }
    if (resp.statusCode() != 200 || envelope.path("status").asText() != "success")
      throw new ClientException(resp.statusCode(),
        envelope.path("message").asText(s"HTTP ${resp.statusCode()}"))
    envelope.get("data")
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private def jobRespOf(n: JsonNode): JobResp = JobResp(
    jobId = n.get("job_id").asText,
    task = n.get("task").asText,
    queue = n.get("queue").asText,
    eta = Option(n.get("eta")).filterNot(_.isNull).map(e => LocalDateTime.parse(e.asText)),
    retries = n.get("retries").asInt)

  private def statusOf(n: JsonNode): JobStatus = JobStatus(
    jobId = n.get("job_id").asText,
    state = stateOf(n.get("state").asText),
    count = n.get("count").asLong,
    error = n.get("error").asText(""))

  private def stateOf(label: String): JobState.Value =
    JobState.values.find(v => JobState.label(v) == label).getOrElse(
      throw new ClientException(200, s"unknown job state from server: $label"))
}
