package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.exec.ModelExecutor

/** Local SQL proxy (SURVEY §2A A45; reference `sql/proxy.py`): serve
  * the project over a wire protocol so external tools can run
  * Jinja-SQL against the warehouse and browse the manifest's schema.
  *
  * The reference speaks MySQL wire via a protocol library; Spark-first
  * the natural transport is HTTP+JSON on the JDK's built-in server
  * (no new dependencies — heavyweight serving is Spark Connect /
  * Thrift's job, SURVEY §3.3; this proxy is the dev-workflow shim).
  * Same contract as the reference, per endpoint:
  *
  *  - `POST /query` `{"sql": …, "limit"?: n}` — Jinja-compile if
  *    templated, hand to Catalyst, return `{columns, rows}`
  *    (reference `DbtSession.query` → `execute_sql_code`,
  *    sql/proxy.py:113-127). Errors come back structured
  *    (`{"error": …}`, HTTP 400), not as dropped connections.
  *  - ALTER TABLE comment middleware: `ALTER TABLE [s.]t MODIFY
  *    COLUMN c … COMMENT 'd'` and `ALTER TABLE [s.]t COMMENT='d'`
  *    update the IN-MEMORY manifest only — no YAML writes — and
  *    return an empty result set (sql/proxy.py:75-110).
  *  - `GET /schema` — schema → table → column → {type, description}
  *    from the live manifest, `UNKNOWN` where no dtype is recorded
  *    (reference `DbtSession.schema` + `mapping_to_columns`,
  *    sql/proxy.py:129-141,144-171).
  *
  * Like the reference ("Experimental local SQL proxy with no
  * dbt-osmosis auth, TLS, or bind hardening", sql/proxy.py:2) this
  * binds loopback only and adds no auth.
  */
final class SqlProxy(executor: ModelExecutor, port: Int = 0,
    llm: graft.core.DocSynthesis.LlmClient =
      graft.core.DocSynthesis.HeuristicClient) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Default row cap for /query responses when the client sends no
    * limit — a dev-proxy guard, not a semantic limit (the reference
    * CLI caps display at 50 rows, cli/main.py result table).
    */
  val DefaultLimit = 1000

  /** Hard ceiling on what any /query response will collect to the
    * proxy, whatever limit the client asks for — see
    * [[SqlProxy.MaxLimit]] (shared with the MySQL wire face so the
    * two caps cannot de-synchronize).
    */
  val MaxLimit: Int = SqlProxy.MaxLimit

  /** Handler threads: the JDK server's default executor runs every
    * handler on the single dispatch thread, serializing clients
    * behind the slowest query; Spark itself schedules concurrent
    * jobs from multiple threads fine (FIFO within the session).
    */
  val WorkerThreads = 8

  def boundPort: Int = server.getAddress.getPort

  def start(): SqlProxy = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/query", (ex: HttpExchange) => handleSafely(ex, handleQuery))
    server.createContext("/cancel", (ex: HttpExchange) => handleSafely(ex, handleCancel))
    server.createContext("/schema", (ex: HttpExchange) => handleSafely(ex, handleSchema))
    server.createContext("/profile", (ex: HttpExchange) => handleSafely(ex, handleProfile))
    server.createContext("/ai", (ex: HttpExchange) => handleSafely(ex, handleAi))
    server.createContext("/", (ex: HttpExchange) => handleSafely(ex, handleIndex))
    pool = java.util.concurrent.Executors.newFixedThreadPool(WorkerThreads)
    server.setExecutor(pool)
    server.start()
    this
  }

  /** Minimal workbench page (SURVEY §2A A46; reference
    * `workbench/app.py` is a Streamlit IDE — here the same operative
    * loop, type Jinja-SQL → execute → inspect results + schema, is a
    * single static page over the JSON endpoints, with per-table
    * profiling via `/profile` (the reference's ydata-profiling pane
    * reduced to the one-pass relation profile; AI assistance stays
    * with DocSynthesis).
    */
  private def handleIndex(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestURI.getPath != "/") return (404, """{"error":"not found"}""")
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    (200, SqlProxy.WorkbenchHtml)
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdownNow()
  }

  private def handleSafely(ex: HttpExchange, h: HttpExchange => (Int, String)): Unit =
    try {
      val (code, body) = try h(ex) catch {
        case e: Exception =>
          val err = mapper.createObjectNode()
          err.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
          (400, err.toString)
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      if (!ex.getResponseHeaders.containsKey("Content-Type"))
        ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    } finally ex.close()

  /** ALTER TABLE comment middleware — shared with the MySQL wire face
    * ([[CommentMiddleware]]): returns Some(empty result) when the
    * statement was intercepted and applied to the manifest.
    */
  private def interceptComment(sql: String): Option[Unit] =
    CommentMiddleware.intercept(executor, sql)

  private def handleQuery(ex: HttpExchange): (Int, String) = {
    val req = mapper.readTree(new String(
      ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    val sql = Option(req.get("sql")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("missing 'sql'"))
    val limit = math.min(MaxLimit,
      math.max(1, Option(req.get("limit")).map(_.asInt()).getOrElse(DefaultLimit)))
    // optional client handle for /cancel: all Spark jobs this request
    // spawns run under a per-tag job group (interrupt-on-cancel), the
    // standard multi-tenant cancellation hook; job groups are
    // thread-local so pooled handlers don't cross-tag each other
    val tag = Option(req.get("tag")).map(_.asText())

    val out = mapper.createObjectNode()
    val cols = out.putArray("columns")
    val rows = out.putArray("rows")
    interceptComment(sql) match {
      case Some(_) => out.put("intercepted", true)
      case None =>
        val sc = executor.session.sparkContext
        tag.foreach(t => sc.setJobGroup(s"proxy-$t",
          s"sql proxy query '$t'", interruptOnCancel = true))
        try {
          val df = executor.executeSql(sql)
          df.columns.foreach(cols.add)
          // the proxy serves humans/tools at dev scale: the limit bounds
          // what crosses the driver, exactly like the reference's
          // adapter fetch; this is NOT a distributed-result path
          collectRows(df, limit, rows)
        } finally if (tag.isDefined) sc.clearJobGroup()
    }
    (200, out.toString)
  }

  /** Cancellation endpoint: `POST /cancel {"tag": …}` kills every
    * in-flight Spark job the tagged /query spawned (the query's
    * handler then returns its error response on its own connection).
    */
  private def handleCancel(ex: HttpExchange): (Int, String) = {
    val req = mapper.readTree(new String(
      ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    val tag = Option(req.get("tag")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("missing 'tag'"))
    executor.session.sparkContext.cancelJobGroup(s"proxy-$tag")
    val out = mapper.createObjectNode()
    out.put("cancelled", tag)
    (200, out.toString)
  }

  private def collectRows(df: org.apache.spark.sql.DataFrame, limit: Int,
      rows: com.fasterxml.jackson.databind.node.ArrayNode): Unit = {
    df.limit(limit).collect().foreach { row =>
          val r = rows.addArray()
          (0 until row.length).foreach { i =>
            row.get(i) match {
              case null => r.addNull()
              case b: java.lang.Boolean => r.add(b.booleanValue())
              case n: java.lang.Integer => r.add(n.intValue())
              case n: java.lang.Long => r.add(n.longValue())
              case n: java.lang.Double => r.add(n.doubleValue())
              case n: java.lang.Float => r.add(n.floatValue())
              case n: java.math.BigDecimal => r.add(n)
              case v => r.add(v.toString)
            }
          }
        }
  }

  /** Profiling endpoint — the workbench face of `Cli profile`
    * (reference: the Streamlit profiling pane, workbench/app.py):
    * `POST /profile {"relation": …}` runs the ONE-PASS per-column
    * profile ([[graft.core.Introspection.profileRelation]] — row
    * count, nulls, approx distinct, min/max in a single scan) and
    * returns `{relation, columns: [{column, dtype, n_rows, n_nulls,
    * approx_distinct, min, max}]}`. Cost is one read of the relation
    * regardless of column count, so the pane stays usable on wide
    * tables.
    *
    * `POST /profile {"relation": …, "deep": true}` upgrades to the
    * ydata-minimal-grade profile
    * ([[graft.core.Introspection.profileRelationDeep]] — numeric
    * moments/quantiles, string length stats, top-k frequent values,
    * histograms) in three bounded scans; the extra per-column fields
    * are `mean, stddev, quantiles, zeros, negatives, len_min,
    * len_avg, len_max, top_values: [{value, n}], histogram:
    * [{lo, hi, n}]`.
    */
  private def handleProfile(ex: HttpExchange): (Int, String) = {
    val req = mapper.readTree(new String(
      ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    val relation = Option(req.get("relation")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("missing 'relation'"))
    val deep = Option(req.get("deep")).exists(_.asBoolean(false))
    val out = mapper.createObjectNode()
    out.put("relation", relation)
    out.put("deep", deep)
    val cols = out.putArray("columns")
    def putBase(c: com.fasterxml.jackson.databind.node.ObjectNode,
        p: graft.core.Introspection.ColumnProfile): Unit = {
      c.put("column", p.column)
      c.put("dtype", p.dtype)
      c.put("n_rows", p.nRows)
      c.put("n_nulls", p.nNulls)
      c.put("approx_distinct", p.approxDistinct)
      p.min.fold[Unit](c.putNull("min"))(v => { c.put("min", v); () })
      p.max.fold[Unit](c.putNull("max"))(v => { c.put("max", v); () })
    }
    if (!deep) {
      graft.core.Introspection.profileRelation(executor.session, relation)
        .foreach { p => putBase(cols.addObject(), p) }
    } else {
      graft.core.Introspection.profileRelationDeep(executor.session, relation)
        .foreach { d =>
          val c = cols.addObject()
          putBase(c, d.base)
          d.mean.foreach(c.put("mean", _))
          d.stddev.foreach(c.put("stddev", _))
          d.quantiles.foreach { q =>
            val a = c.putArray("quantiles"); q.foreach(a.add)
          }
          d.zeros.foreach(c.put("zeros", _))
          d.negatives.foreach(c.put("negatives", _))
          d.lenMin.foreach(c.put("len_min", _))
          d.lenAvg.foreach(c.put("len_avg", _))
          d.lenMax.foreach(c.put("len_max", _))
          if (d.topValues.nonEmpty) {
            val a = c.putArray("top_values")
            d.topValues.foreach { tv =>
              val o = a.addObject(); o.put("value", tv.value); o.put("n", tv.n)
            }
          }
          if (d.histogram.nonEmpty) {
            val a = c.putArray("histogram")
            d.histogram.foreach { hb =>
              val o = a.addObject()
              o.put("lo", hb.lo); o.put("hi", hb.hi); o.put("n", hb.n)
            }
          }
        }
    }
    (200, out.toString)
  }

  /** AI-assistant endpoint — the workbench face of the reference's
    * AI pane (workbench/app.py), over the pluggable [[llm]] client
    * (the same [[graft.core.DocSynthesis]] surface `Cli document
    * --synthesize` uses; HeuristicClient by default, a real client by
    * injection):
    *
    *  - `POST /ai {"op":"doc","table":…}` — synthesize missing node +
    *    column docs (inherit-first, bulk-vs-per-column policy) and
    *    apply them to the IN-MEMORY manifest, mirroring the comment
    *    middleware's no-YAML-writes posture. Returns what was filled.
    *  - `POST /ai {"op":"sql","query":…}` — natural language → a
    *    Jinja-SQL draft over the manifest's relations; the workbench
    *    inserts it into the editor, the user runs it explicitly.
    */
  private def handleAi(ex: HttpExchange): (Int, String) = {
    val req = mapper.readTree(new String(
      ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    val op = Option(req.get("op")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("missing 'op' (doc | sql)"))
    val out = mapper.createObjectNode()
    op match {
      case "doc" =>
        val table = Option(req.get("table")).map(_.asText()).getOrElse(
          throw new IllegalArgumentException("missing 'table'"))
        val node = executor.manifest.nodes.values.find(_.name == table)
          .getOrElse(throw new IllegalArgumentException(s"unknown table '$table'"))
        val synthesized = graft.core.DocSynthesis.synthesizeNode(
          executor.manifest, node, graft.core.EngineSettings(), llm)
        executor.updateNode(synthesized)
        out.put("table", table)
        out.put("description", synthesized.description)
        val cols = out.putObject("columns")
        synthesized.columns.values.foreach(c =>
          cols.put(c.name, c.description.getOrElse("")))
      case "sql" =>
        val query = Option(req.get("query")).map(_.asText()).getOrElse(
          throw new IllegalArgumentException("missing 'query'"))
        val rels = executor.manifest.nodes.values
          .filter(n => Set("model", "seed", "source").contains(n.resourceType))
          .map(n => n.name -> n.columns.keys.toSeq).toSeq.sortBy(_._1)
        out.put("sql",
          graft.core.DocSynthesis.generateSqlFromNl(llm, query, rels))
      case other =>
        throw new IllegalArgumentException(s"unknown op '$other' (doc | sql)")
    }
    (200, out.toString)
  }

  private[serve] def handleSchema(ex: HttpExchange): (Int, String) = {
    val out = mapper.createObjectNode()
    executor.manifest.nodes.values
      .filter(n => Set("model", "seed", "source").contains(n.resourceType))
      .foreach { n =>
        val schemaNode = out.get(n.schema) match {
          case o: com.fasterxml.jackson.databind.node.ObjectNode => o
          case _ => out.putObject(n.schema)
        }
        val tableNode = schemaNode.putObject(n.name)
        n.columns.values.foreach { c =>
          val colNode = tableNode.putObject(c.name)
          colNode.put("type", c.dataType.getOrElse("UNKNOWN"))
          c.description match {
            case Some(d) => colNode.put("description", d)
            case None => colNode.putNull("description")
          }
        }
      }
    (200, out.toString)
  }
}

object SqlProxy {

  /** Hard ceiling on what any response (HTTP /query or a MySQL wire
    * resultset) will collect to the proxy, whatever limit the client
    * asks for — the driver-side guard that keeps one greedy request
    * from OOMing the session (the distributed path for big results is
    * a sink write, not this proxy).
    */
  val MaxLimit = 10000

  /** The workbench page: plain HTML+JS over /query and /schema, no
    * external assets (works fully offline). Kept as one string so the
    * proxy jar stays self-contained.
    */
  private[serve] val WorkbenchHtml: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft workbench</title>
      |<style>
      | body{font-family:monospace;margin:0;display:flex;height:100vh}
      | #side{width:260px;overflow:auto;border-right:1px solid #ccc;padding:8px}
      | #main{flex:1;display:flex;flex-direction:column;padding:8px}
      | textarea{width:100%;height:140px;font-family:monospace}
      | table{border-collapse:collapse;margin-top:8px}
      | td,th{border:1px solid #999;padding:2px 6px;text-align:left}
      | #err{color:#b00}
      | .tbl{cursor:pointer;margin-left:8px}
      | .col{margin-left:20px;color:#555}
      | .prof{cursor:pointer;color:#06c;margin-left:6px;font-size:90%}
      |</style></head><body>
      |<div id="side"><b>schema</b><div id="schema">loading…</div></div>
      |<div id="main">
      | <textarea id="sql">SELECT 1 AS one -- jinja OK: {{ ref('model') }}</textarea>
      | <div><button id="run">run</button>
      |   limit <input id="limit" value="100" size="5"></div>
      | <div><input id="nl" size="60"
      |   placeholder="describe a query in plain language">
      |   <button id="draft">ai: draft sql</button></div>
      | <div id="err"></div><div id="out"></div>
      |</div>
      |<script>
      |const $=id=>document.getElementById(id);
      |const esc=v=>String(v).replace(/&/g,'&amp;').replace(/</g,'&lt;')
      |  .replace(/>/g,'&gt;').replace(/"/g,'&quot;');
      |fetch('/schema').then(r=>r.json()).then(s=>{
      |  let h='';
      |  for(const sch of Object.keys(s).sort()){
      |    h+='<div><b>'+esc(sch)+'</b></div>';
      |    for(const t of Object.keys(s[sch]).sort()){
      |      h+='<div><span class="tbl" data-t="'+esc(t)+'">'+esc(t)+
      |        '</span><span class="prof" data-t="'+esc(t)+
      |        '">[profile]</span><span class="prof ai" data-t="'+esc(t)+
      |        '">[ai doc]</span></div><div class="col">'+
      |        Object.entries(s[sch][t]).map(([c,m])=>esc(c)+' : '+
      |          esc(m.type)).join('<br>')+'</div>';
      |    }
      |  }
      |  $('schema').innerHTML=h||'(empty manifest)';
      |  document.querySelectorAll('.tbl').forEach(el=>el.onclick=()=>{
      |    $('sql').value='SELECT * FROM '+el.dataset.t;run();});
      |  document.querySelectorAll('.prof:not(.ai)').forEach(el=>el.onclick=()=>{
      |    profile(el.dataset.t);});
      |  document.querySelectorAll('.ai').forEach(el=>el.onclick=()=>{
      |    aiDoc(el.dataset.t);});
      |});
      |function aiDoc(t){
      |  $('err').textContent='';$('out').innerHTML='synthesizing…';
      |  fetch('/ai',{method:'POST',body:JSON.stringify({op:'doc',table:t})})
      |  .then(r=>r.json()).then(j=>{
      |    if(j.error){$('err').textContent=j.error;$('out').innerHTML='';return;}
      |    $('out').innerHTML='<b>ai docs: '+esc(j.table)+'</b><p>'+
      |      esc(j.description)+'</p><table><tr><th>column</th>'+
      |      '<th>description</th></tr>'+
      |      Object.entries(j.columns).map(([c,d])=>'<tr><td>'+esc(c)+
      |        '</td><td>'+esc(d)+'</td></tr>').join('')+'</table>';
      |  }).catch(e=>$('err').textContent=e);
      |}
      |$('draft').onclick=()=>{
      |  $('err').textContent='';
      |  fetch('/ai',{method:'POST',body:JSON.stringify(
      |    {op:'sql',query:$('nl').value})})
      |  .then(r=>r.json()).then(j=>{
      |    if(j.error){$('err').textContent=j.error;return;}
      |    $('sql').value=j.sql;
      |  }).catch(e=>$('err').textContent=e);
      |};
      |function spark(h){
      |  if(!h||!h.length)return '';
      |  const m=Math.max(...h.map(b=>b.n),1),g='▁▂▃▄▅▆▇█';
      |  return h.map(b=>g[Math.min(7,Math.round(b.n/m*7))]).join('');
      |}
      |function profile(t){
      |  $('err').textContent='';$('out').innerHTML='profiling…';
      |  fetch('/profile',{method:'POST',body:JSON.stringify(
      |    {relation:t,deep:true})})
      |  .then(r=>r.json()).then(j=>{
      |    if(j.error){$('err').textContent=j.error;$('out').innerHTML='';return;}
      |    const ks=['column','dtype','n_rows','n_nulls','approx_distinct',
      |      'min','max'];
      |    const fmt=v=>typeof v==='number'&&!Number.isInteger(v)
      |      ?v.toPrecision(4):v;
      |    $('out').innerHTML='<b>profile: '+esc(j.relation)+'</b>'+
      |      '<table><tr>'+ks.map(k=>'<th>'+k+'</th>').join('')+
      |      '<th>mean±std</th><th>p05/p50/p95</th><th>len</th>'+
      |      '<th>top values</th><th>hist</th></tr>'+
      |      j.columns.map(c=>'<tr>'+ks.map(k=>'<td>'+
      |        (c[k]===null||c[k]===undefined?'NULL':esc(c[k]))+'</td>')
      |        .join('')+
      |        '<td>'+(c.mean!==undefined?esc(fmt(c.mean))+'±'+
      |          esc(fmt(c.stddev!==undefined?c.stddev:0)):'')+'</td>'+
      |        '<td>'+(c.quantiles?[0,2,4].map(i=>esc(fmt(c.quantiles[i])))
      |          .join(' / '):'')+'</td>'+
      |        '<td>'+(c.len_min!==undefined?c.len_min+'/'+
      |          esc(fmt(c.len_avg))+'/'+c.len_max:'')+'</td>'+
      |        '<td>'+(c.top_values?c.top_values.map(v=>esc(v.value)+
      |          '×'+v.n).join(', '):'')+'</td>'+
      |        '<td title="'+(c.histogram?esc(fmt(c.histogram[0].lo))+' … '+
      |          esc(fmt(c.histogram[c.histogram.length-1].hi)):'')+'">'+
      |          spark(c.histogram)+'</td>'+
      |        '</tr>').join('')+'</table>';
      |  }).catch(e=>$('err').textContent=e);
      |}
      |function run(){
      |  $('err').textContent='';$('out').innerHTML='…';
      |  fetch('/query',{method:'POST',body:JSON.stringify(
      |    {sql:$('sql').value,limit:+$('limit').value||100})})
      |  .then(r=>r.json()).then(j=>{
      |    if(j.error){$('err').textContent=j.error;$('out').innerHTML='';return;}
      |    if(j.intercepted){$('out').innerHTML='<i>manifest updated</i>';return;}
      |    $('out').innerHTML='<table><tr>'+
      |      j.columns.map(c=>'<th>'+esc(c)+'</th>').join('')+'</tr>'+
      |      j.rows.map(r=>'<tr>'+r.map(v=>'<td>'+(v===null?'NULL':esc(v))+
      |        '</td>').join('')+'</tr>').join('')+'</table>';
      |  }).catch(e=>$('err').textContent=e);
      |}
      |$('run').onclick=run;
      |</script></body></html>""".stripMargin
}
