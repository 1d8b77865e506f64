package graft.serve

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.exec.ModelExecutor
import graft.project.ProjectLoader

/** MySQL wire face (A45): a from-scratch mini-client in this spec —
  * its own framing and length-encoding parsers, deliberately NOT the
  * server's helpers — drives the full connection + command phases
  * over a real loopback socket, the differential a protocol
  * implementation needs.
  */
class MysqlFaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  lazy val (executor, face) = {
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val e = new ModelExecutor(spark, ProjectLoader.load("fixtures/jaffle"))
    e.buildAll()
    (e, new MysqlFace(e).start())
  }

  // ---------------- mini client (independent implementation) -------

  private class Client(port: Int = face.boundPort) {
    val sock = new Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true)
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)

    def readPacket(): (Int, Array[Byte]) = {
      def b(): Int = { val v = in.read(); if (v < 0) throw new EOFException; v }
      val n = b() | (b() << 8) | (b() << 16)
      val seq = b()
      val p = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(p, off, n - off); if (r < 0) throw new EOFException
        off += r
      }
      (seq, p)
    }

    def writePacket(seq: Int, payload: Array[Byte]): Unit = {
      // independent implementation of the split rule: 0xffffff-byte
      // chunks with consecutive sequence ids, shorter terminator
      var off = 0
      var s = seq
      var continue = true
      while (continue) {
        val n = math.min(0xffffff, payload.length - off)
        out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
        out.write(s & 0xff); out.write(payload, off, n)
        off += n; s += 1
        continue = n == 0xffffff
      }
      out.flush()
    }

    /** (value, bytes consumed) at offset. */
    def lenc(p: Array[Byte], off: Int): (Long, Int) = (p(off) & 0xff) match {
      case 0xfb => (-1L, 1) // NULL marker in row context
      case 0xfc => (((p(off + 1) & 0xffL)) | ((p(off + 2) & 0xffL) << 8), 3)
      case 0xfd => ((p(off + 1) & 0xffL) | ((p(off + 2) & 0xffL) << 8) |
        ((p(off + 3) & 0xffL) << 16), 4)
      case 0xfe => ((0 until 8).map(i => (p(off + 1 + i) & 0xffL) << (8 * i)).sum, 9)
      case v => (v.toLong, 1)
    }

    def lencString(p: Array[Byte], off: Int): (String, Int) = {
      val (n, used) = lenc(p, off)
      (new String(p, off + used, n.toInt, StandardCharsets.UTF_8), used + n.toInt)
    }

    /** Connection phase: returns the parsed greeting (version, plugin). */
    def handshake(): (String, String) = {
      val (seq0, greet) = readPacket()
      assert(seq0 == 0 && greet(0) == 10, "expected HandshakeV10 at seq 0")
      val verEnd = greet.indexOf(0, 1)
      val version = new String(greet, 1, verEnd - 1, StandardCharsets.UTF_8)
      val plugin = {
        // auth plugin name is the trailing null-terminated string
        val end = greet.length - 1
        val start = greet.lastIndexOf(0.toByte, end - 1) + 1
        new String(greet, start, end - start, StandardCharsets.UTF_8)
      }
      // HandshakeResponse41: PROTOCOL_41 | SECURE_CONNECTION | PLUGIN_AUTH
      val flags = 0x00000200L | 0x00008000L | 0x00080000L
      val b = scala.collection.mutable.ArrayBuffer[Byte]()
      def le(v: Long, n: Int): Unit = (0 until n).foreach(i => b += ((v >> (8 * i)) & 0xff).toByte)
      le(flags, 4); le(16 * 1024 * 1024, 4); b += 33
      b ++= Array.fill[Byte](23)(0)
      b ++= "root".getBytes(StandardCharsets.UTF_8); b += 0
      b += 0 // empty auth response (no password)
      b ++= "mysql_native_password".getBytes(StandardCharsets.UTF_8); b += 0
      writePacket(1, b.toArray)
      val (_, ok) = readPacket()
      assert((ok(0) & 0xff) == 0x00, "expected OK after handshake response")
      (version, plugin)
    }

    /** Connection phase with credentials: parses the greeting's
      * 20-byte nonce (8-byte part 1 + 12-byte part 2 at their fixed
      * offsets) and answers with an INDEPENDENTLY computed
      * mysql_native_password scramble — returns the reply's first
      * byte (0x00 OK / 0xff ERR) and, for ERR, the error code.
      */
    def handshakeAuth(user: String, password: Option[String]): (Int, Int) = {
      val (seq0, greet) = readPacket()
      assert(seq0 == 0 && greet(0) == 10)
      val verEnd = greet.indexOf(0, 1)
      val p1 = verEnd + 1 + 4 // past connection id
      val nonce = new Array[Byte](20)
      System.arraycopy(greet, p1, nonce, 0, 8)
      // filler(1) caps-low(2) charset(1) status(2) caps-high(2)
      // auth-len(1) reserved(10) -> part 2
      System.arraycopy(greet, p1 + 8 + 19, nonce, 8, 12)
      val token = password match {
        case None => Array.empty[Byte]
        case Some(pw) =>
          val md = java.security.MessageDigest.getInstance("SHA-1")
          val h1 = md.digest(pw.getBytes(StandardCharsets.UTF_8))
          md.reset(); val h2 = md.digest(h1)
          md.reset(); md.update(nonce); md.update(h2)
          val h3 = md.digest()
          h1.indices.map(i => (h1(i) ^ h3(i)).toByte).toArray
      }
      val flags = 0x00000200L | 0x00008000L | 0x00080000L
      val b = scala.collection.mutable.ArrayBuffer[Byte]()
      def le(v: Long, n: Int): Unit =
        (0 until n).foreach(i => b += ((v >> (8 * i)) & 0xff).toByte)
      le(flags, 4); le(16 * 1024 * 1024, 4); b += 33
      b ++= Array.fill[Byte](23)(0)
      b ++= user.getBytes(StandardCharsets.UTF_8); b += 0
      b += token.length.toByte; b ++= token
      b ++= "mysql_native_password".getBytes(StandardCharsets.UTF_8); b += 0
      writePacket(1, b.toArray)
      val (_, reply) = readPacket()
      val code =
        if ((reply(0) & 0xff) == 0xff)
          (reply(1) & 0xff) | ((reply(2) & 0xff) << 8)
        else 0
      ((reply(0) & 0xff), code)
    }

    def comQuery(sql: String): Unit =
      writePacket(0, Array(0x03.toByte) ++ sql.getBytes(StandardCharsets.UTF_8))

    /** Parse a full text resultset: (column names, rows as Option[String]). */
    def readResultSet(): (Seq[String], Seq[Seq[Option[String]]]) = {
      val (_, first) = readPacket()
      if ((first(0) & 0xff) == 0xff)
        fail("got ERR: " +
          new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
      val (nCols, _) = lenc(first, 0)
      val names = (0 until nCols.toInt).map { _ =>
        val (_, cd) = readPacket()
        var off = 0
        // catalog, schema, table, org_table, name
        (0 until 4).foreach { _ => off += lencString(cd, off)._2 }
        lencString(cd, off)._1
      }
      val (_, eof1) = readPacket()
      assert((eof1(0) & 0xff) == 0xfe && eof1.length < 9, "expected EOF after columns")
      val rows = scala.collection.mutable.ArrayBuffer[Seq[Option[String]]]()
      var done = false
      while (!done) {
        val (_, p) = readPacket()
        if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
        else {
          var off = 0
          val vals = (0 until nCols.toInt).map { _ =>
            if ((p(off) & 0xff) == 0xfb) { off += 1; None }
            else { val (s, used) = lencString(p, off); off += used; Some(s) }
          }
          rows += vals
        }
      }
      (names, rows.toSeq)
    }

    def readOk(): Unit = {
      val (_, p) = readPacket()
      assert((p(0) & 0xff) == 0x00,
        s"expected OK, got 0x${(p(0) & 0xff).toHexString}")
    }

    def readErr(): (Int, String) = {
      val (_, p) = readPacket()
      assert((p(0) & 0xff) == 0xff, "expected ERR")
      val code = (p(1) & 0xff) | ((p(2) & 0xff) << 8)
      (code, new String(p, 9, p.length - 9, StandardCharsets.UTF_8))
    }

    def close(): Unit = {
      try { writePacket(0, Array(0x01.toByte)) } catch { case _: Throwable => () }
      sock.close()
    }
  }

  private def withClient[A](f: Client => A): A = {
    val c = new Client
    try { c.handshake(); f(c) } finally c.close()
  }

  // ---------------- tests ------------------------------------------

  test("handshake advertises protocol 10, graft version, native-password plugin") {
    val c = new Client
    try {
      val (version, plugin) = c.handshake()
      assert(version.contains("graft"))
      assert(plugin == "mysql_native_password")
    } finally c.close()
  }

  test("COM_QUERY returns a text resultset with correct columns and values") {
    withClient { c =>
      c.comQuery("SELECT customer_id, number_of_orders FROM customers " +
        "WHERE customer_id = 1")
      val (names, rows) = c.readResultSet()
      assert(names == Seq("customer_id", "number_of_orders"))
      assert(rows == Seq(Seq(Some("1"), Some("3"))))
    }
  }

  test("jinja SQL compiles before execution, NULLs ride the 0xFB marker") {
    withClient { c =>
      c.comQuery("SELECT COUNT(*) AS n FROM {{ ref('customers') }}")
      val (names, rows) = c.readResultSet()
      assert(names == Seq("n") && rows.head.head.exists(_.toLong > 0))
      c.comQuery("SELECT CAST(NULL AS STRING) AS nothing")
      val (_, rows2) = c.readResultSet()
      assert(rows2 == Seq(Seq(None)))
    }
  }

  test("ALTER TABLE comment statements answer OK and hit the shared middleware") {
    withClient { c =>
      c.comQuery("ALTER TABLE customers MODIFY COLUMN customer_id BIGINT " +
        "COMMENT 'pk via mysql wire'")
      c.readOk()
      val n = executor.manifest.nodes.values.find(_.name == "customers").get
      assert(n.columns("customer_id").description.contains("pk via mysql wire"))
    }
  }

  test("bad SQL returns ERR 1064 and the connection stays usable") {
    withClient { c =>
      c.comQuery("SELECT FROM WHERE")
      val (code, msg) = c.readErr()
      assert(code == 1064 && msg.nonEmpty)
      c.comQuery("SELECT 1 AS one")
      val (_, rows) = c.readResultSet()
      assert(rows == Seq(Seq(Some("1"))))
    }
  }

  test("client-bootstrap shims: SET answers OK, SELECT @@var answers one row, COM_PING pongs") {
    withClient { c =>
      c.comQuery("SET NAMES utf8mb4")
      c.readOk()
      c.comQuery("SELECT @@version_comment")
      val (names, rows) = c.readResultSet()
      assert(names == Seq("@@version_comment"))
      assert(rows == Seq(Seq(Some("graft proxy"))))
      c.writePacket(0, Array(0x0e.toByte)) // COM_PING
      c.readOk()
    }
  }

  test("real-client bootstrap probes: CLI's LIMIT form and Connector/J's multi-var select") {
    withClient { c =>
      // the mysql CLI's literal first query
      c.comQuery("select @@version_comment limit 1")
      val (n1, r1) = c.readResultSet()
      assert(n1 == Seq("@@version_comment") && r1 == Seq(Seq(Some("graft proxy"))))
      // Connector/J-style multi-variable probe with aliases
      c.comQuery("SELECT @@session.auto_increment_increment AS auto_increment_increment, " +
        "@@character_set_client AS character_set_client, @@version AS version")
      val (n2, r2) = c.readResultSet()
      assert(n2 == Seq("auto_increment_increment", "character_set_client", "version"))
      assert(r2 == Seq(Seq(Some("1"), Some("utf8mb4"), Some("8.0.0-graft"))))
    }
  }

  test("pipelined commands: a second COM_QUERY sent early is answered in order") {
    withClient { c =>
      // send both queries back-to-back BEFORE reading any response —
      // exercises the pushback path (the connection thread peeks the
      // pipelined byte while the first query runs)
      c.comQuery("SELECT 1 AS one")
      c.writePacket(0, Array(0x03.toByte) ++
        "SELECT 2 AS two".getBytes(StandardCharsets.UTF_8))
      val (n1, r1) = c.readResultSet()
      assert(n1 == Seq("one") && r1 == Seq(Seq(Some("1"))))
      val (n2, r2) = c.readResultSet()
      assert(n2 == Seq("two") && r2 == Seq(Seq(Some("2"))))
    }
  }

  test("SHOW DATABASES / SHOW TABLES browse the manifest like a stock client") {
    withClient { c =>
      c.comQuery("SHOW DATABASES")
      val (dn, dr) = c.readResultSet()
      assert(dn == Seq("Database"))
      val dbs = dr.flatMap(_.head)
      assert(dbs.contains("main") && dbs.contains("warehouse") &&
        dbs.contains("information_schema"))
      assert(dbs == dbs.sorted)

      c.comQuery("SHOW TABLES")
      val (tn, tr) = c.readResultSet()
      assert(tn == Seq("Tables_in_main"))
      val tables = tr.flatMap(_.head)
      assert(tables.contains("customers") && tables.contains("stg_orders"))
      assert(tables == tables.sorted)

      c.comQuery("SHOW TABLES LIKE 'stg%'")
      val (ln, lr) = c.readResultSet()
      assert(ln == Seq("Tables_in_main (stg%)"))
      assert(lr.nonEmpty && lr.flatMap(_.head).forall(_.startsWith("stg")))

      c.comQuery("SHOW TABLES FROM warehouse")
      val (_, wr) = c.readResultSet()
      assert(wr.flatMap(_.head) == Seq("region_lookup"))

      c.comQuery("SHOW FULL TABLES")
      val (fn, fr) = c.readResultSet()
      assert(fn.head == "Tables_in_main" && fn(1) == "Table_type")
      assert(fr.forall(r => Set("BASE TABLE", "VIEW").contains(r(1).get)))

      c.comQuery("SHOW TABLES FROM no_such_db")
      val (code, msg) = c.readErr()
      assert(code == 1049 && msg.contains("no_such_db"))
    }
  }

  test("DESCRIBE and SHOW COLUMNS answer manifest-backed field lists") {
    withClient { c =>
      c.comQuery("DESCRIBE customers")
      val (names, rows) = c.readResultSet()
      assert(names == Seq("Field", "Type", "Null", "Key", "Default", "Extra"))
      assert(rows.map(_.head.get) == Seq("customer_id", "first_name",
        "last_name", "first_order", "most_recent_order", "number_of_orders",
        "customer_lifetime_value", "customer_average_value"))
      assert(rows.forall(_(4).isEmpty), "Default rides the NULL marker")

      // qualified form + FULL: the Comment column carries the manifest
      // description
      c.comQuery("SHOW FULL COLUMNS FROM warehouse.region_lookup")
      val (fn, fr) = c.readResultSet()
      assert(fn == Seq("Field", "Type", "Collation", "Null", "Key",
        "Default", "Extra", "Privileges", "Comment"))
      val regionId = fr.find(_.head.contains("region_id")).get
      assert(regionId.last.contains("Region identifier"))

      c.comQuery("SHOW COLUMNS FROM region_lookup FROM warehouse LIKE '%_id'")
      val (_, pr) = c.readResultSet()
      assert(pr.map(_.head.get) == Seq("region_id"))

      c.comQuery("DESCRIBE no_such_table")
      val (code, msg) = c.readErr()
      assert(code == 1146 && msg.contains("no_such_table"))
    }
  }

  test("information_schema SELECTs run through Catalyst with full SQL power") {
    withClient { c =>
      c.comQuery("SELECT column_name, data_type, column_comment " +
        "FROM information_schema.columns WHERE table_name = 'region_lookup' " +
        "ORDER BY ordinal_position")
      val (names, rows) = c.readResultSet()
      assert(names == Seq("column_name", "data_type", "column_comment"))
      assert(rows.head == Seq(Some("region_id"), Some("UNKNOWN"),
        Some("Region identifier")))

      c.comQuery("SELECT table_name FROM information_schema.tables " +
        "WHERE table_schema = 'warehouse'")
      val (_, tr) = c.readResultSet()
      assert(tr == Seq(Seq(Some("region_lookup"))))

      // joins + aggregation over the metadata views — the point of
      // routing through Catalyst instead of a regex-shaped subset
      c.comQuery("SELECT t.table_schema, COUNT(*) AS n_cols " +
        "FROM information_schema.tables t " +
        "JOIN information_schema.columns c ON t.table_name = c.table_name " +
        "WHERE t.table_schema = 'warehouse' GROUP BY t.table_schema")
      val (_, jr) = c.readResultSet()
      assert(jr.length == 1 && jr.head.head.contains("warehouse") &&
        jr.head(1).exists(_.toLong >= 1))

      c.comQuery("SELECT schema_name FROM information_schema.schemata ORDER BY 1")
      val (_, sr) = c.readResultSet()
      assert(sr.flatMap(_.head).contains("warehouse"))
    }
  }

  test("USE and COM_INIT_DB switch the default schema for SHOW TABLES") {
    withClient { c =>
      c.comQuery("USE warehouse")
      c.readOk()
      c.comQuery("SHOW TABLES")
      val (n1, r1) = c.readResultSet()
      assert(n1 == Seq("Tables_in_warehouse"))
      assert(r1.flatMap(_.head) == Seq("region_lookup"))
      // COM_INIT_DB switches back
      c.writePacket(0, Array(0x02.toByte) ++
        "main".getBytes(StandardCharsets.UTF_8))
      c.readOk()
      c.comQuery("SHOW TABLES")
      val (n2, _) = c.readResultSet()
      assert(n2 == Seq("Tables_in_main"))
    }
  }

  test("prepared statements: COM_STMT_PREPARE/EXECUTE round-trip the binary protocol") {
    withClient { c =>
      // prepare: 1 placeholder
      c.writePacket(0, Array(0x16.toByte) ++
        ("SELECT customer_id, number_of_orders FROM customers " +
          "WHERE customer_id = ?").getBytes(StandardCharsets.UTF_8))
      val (_, ok) = c.readPacket()
      assert((ok(0) & 0xff) == 0x00, "expected COM_STMT_PREPARE_OK")
      val stmtId = (ok(1) & 0xff) | ((ok(2) & 0xff) << 8) |
        ((ok(3) & 0xff) << 16) | ((ok(4) & 0xff) << 24)
      val nCols = (ok(5) & 0xff) | ((ok(6) & 0xff) << 8)
      val nParams = (ok(7) & 0xff) | ((ok(8) & 0xff) << 8)
      assert(nCols == 0 && nParams == 1)
      // param definition + EOF follow
      c.readPacket() // param def
      val (_, eof) = c.readPacket()
      assert((eof(0) & 0xff) == 0xfe)

      // execute with customer_id = 1 bound as LONGLONG
      val ex = scala.collection.mutable.ArrayBuffer[Byte](0x17.toByte)
      def le(v: Long, n: Int): Unit =
        (0 until n).foreach(i => ex += ((v >> (8 * i)) & 0xff).toByte)
      le(stmtId.toLong, 4)
      ex += 0 // flags
      le(1L, 4) // iteration count
      ex += 0 // null bitmap (1 param -> 1 byte, nothing null)
      ex += 1 // new-params-bound
      ex += 0x08.toByte; ex += 0 // type LONGLONG, signed
      le(1L, 8) // value
      c.writePacket(0, ex.toArray)

      // binary resultset: column defs ride the same shape; rows are
      // 0x00-headed with a NULL bitmap then lenc strings
      val (_, first) = c.readPacket()
      assert((first(0) & 0xff) != 0xff,
        "ERR: " + new String(first.drop(9), StandardCharsets.UTF_8))
      val (colCount, _) = c.lenc(first, 0)
      assert(colCount == 2)
      (0 until 2).foreach(_ => c.readPacket())
      val (_, eof2) = c.readPacket()
      assert((eof2(0) & 0xff) == 0xfe)
      val (_, row) = c.readPacket()
      assert((row(0) & 0xff) == 0x00, "binary row header")
      // bitmap byte: (2 cols + 2 offset + 7)/8 = 1 byte, no NULLs
      assert(row(1) == 0)
      val (v1, used1) = c.lencString(row, 2)
      val (v2, _) = c.lencString(row, 2 + used1)
      assert(v1 == "1" && v2 == "3")
      val (_, eof3) = c.readPacket()
      assert((eof3(0) & 0xff) == 0xfe && eof3.length < 9)

      // COM_STMT_CLOSE has no response; the connection stays usable
      val cl = scala.collection.mutable.ArrayBuffer[Byte](0x19.toByte)
      (0 until 4).foreach(i => cl += ((stmtId >> (8 * i)) & 0xff).toByte)
      c.writePacket(0, cl.toArray)
      c.writePacket(0, Array(0x0e.toByte)) // COM_PING
      c.readOk()
    }
  }

  test("prepared statements: string params escape, NULL params ride the bitmap") {
    withClient { c =>
      // string with a quote — exercises literal escaping
      c.writePacket(0, Array(0x16.toByte) ++
        "SELECT ? AS echo".getBytes(StandardCharsets.UTF_8))
      val (_, ok) = c.readPacket()
      val stmtId = (ok(1) & 0xff) | ((ok(2) & 0xff) << 8)
      c.readPacket(); c.readPacket() // param def + EOF
      val s = "o'hara \\ test"
      val sb = s.getBytes(StandardCharsets.UTF_8)
      val ex = scala.collection.mutable.ArrayBuffer[Byte](0x17.toByte)
      def le(v: Long, n: Int): Unit =
        (0 until n).foreach(i => ex += ((v >> (8 * i)) & 0xff).toByte)
      le(stmtId.toLong, 4); ex += 0; le(1L, 4)
      ex += 0; ex += 1
      ex += 0xfd.toByte; ex += 0 // VAR_STRING
      ex += sb.length.toByte; ex ++= sb
      c.writePacket(0, ex.toArray)
      val (_, first) = c.readPacket()
      assert((first(0) & 0xff) != 0xff,
        "ERR: " + new String(first.drop(9), StandardCharsets.UTF_8))
      c.readPacket(); c.readPacket() // col def + EOF
      val (_, row) = c.readPacket()
      assert(c.lencString(row, 2)._1 == s)
      c.readPacket() // trailing EOF

      // NULL param: bitmap bit set, no value bytes
      c.writePacket(0, Array(0x16.toByte) ++
        "SELECT ? AS nothing".getBytes(StandardCharsets.UTF_8))
      val (_, ok2) = c.readPacket()
      val id2 = (ok2(1) & 0xff) | ((ok2(2) & 0xff) << 8)
      c.readPacket(); c.readPacket()
      val ex2 = scala.collection.mutable.ArrayBuffer[Byte](0x17.toByte)
      def le2(v: Long, n: Int): Unit =
        (0 until n).foreach(i => ex2 += ((v >> (8 * i)) & 0xff).toByte)
      le2(id2.toLong, 4); ex2 += 0; le2(1L, 4)
      ex2 += 1 // null bitmap: param 0 is NULL
      ex2 += 1 // new-params-bound
      ex2 += 0xfd.toByte; ex2 += 0
      c.writePacket(0, ex2.toArray)
      val (_, f2) = c.readPacket()
      assert((f2(0) & 0xff) != 0xff)
      c.readPacket(); c.readPacket()
      val (_, row2) = c.readPacket()
      // binary row: header 0x00, bitmap bit (0 + 2) set = NULL column
      assert((row2(0) & 0xff) == 0x00 && (row2(1) & 0x04) != 0)
      c.readPacket()
    }
  }

  test("a command split across wire packets gets its response at lastSeq+1") {
    withClient { c =>
      // pad a COM_QUERY to EXACTLY max_allowed_packet (16777216) bytes:
      // 16777215-byte chunk (seq 0) + 1-byte chunk (seq 1) -> the
      // response must start at seq 2, or strict clients desync
      val sql = "SELECT 1 AS one" + (" " * (MysqlFace.MaxAllowedPacket - 1 -
        "SELECT 1 AS one".length))
      val payload = Array(0x03.toByte) ++ sql.getBytes(StandardCharsets.UTF_8)
      assert(payload.length == MysqlFace.MaxAllowedPacket)
      c.writePacket(0, payload)
      val (seq, first) = c.readPacket()
      assert(seq == 2, s"response to a split command must continue at 2, got $seq")
      assert((first(0) & 0xff) != 0xff)
      val (nCols, _) = c.lenc(first, 0)
      (0 until nCols.toInt).foreach(_ => c.readPacket()) // col defs
      c.readPacket() // EOF
      val (_, row) = c.readPacket()
      assert(c.lencString(row, 0)._1 == "1")
      c.readPacket() // EOF
    }
  }

  test("oversized command answers ERR 1153 before the connection closes") {
    val c = new Client
    try {
      c.handshake()
      // an 17 MiB COM_QUERY — over the advertised max_allowed_packet
      val big = new Array[Byte](17 * 1024 * 1024)
      java.util.Arrays.fill(big, ' '.toByte)
      big(0) = 0x03
      c.writePacket(0, big)
      val (code, msg) = c.readErr()
      assert(code == 1153 && msg.contains("max_allowed_packet"))
      // the stream is desynced by design; the server closes after ERR
    } finally c.close()
  }

  test("readPacket enforces maxBytes on reassembly") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val payload = new Array[Byte](MysqlFace.MaxPacket + 10)
    val bos = new ByteArrayOutputStream()
    MysqlFace.writePacket(bos, 0, payload)
    // under the cap: round-trips
    val (_, ok) = MysqlFace.readPacket(
      new ByteArrayInputStream(bos.toByteArray), MysqlFace.MaxPacket + 10)
    assert(ok.length == payload.length)
    // over the cap: loud IOException, not unbounded buffering
    intercept[java.io.IOException] {
      MysqlFace.readPacket(
        new ByteArrayInputStream(bos.toByteArray), MysqlFace.MaxPacket - 1)
    }
  }

  test("packet framing splits and reassembles payloads at the 16 MiB boundary") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    // independent check of the server's framing helpers against this
    // spec's reader, at and around the 0xffffff split boundary
    for (n <- Seq(0, 1, MysqlFace.MaxPacket - 1, MysqlFace.MaxPacket,
        MysqlFace.MaxPacket + 1, MysqlFace.MaxPacket * 2 + 7)) {
      val payload = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val bos = new ByteArrayOutputStream()
      val nextSeq = MysqlFace.writePacket(bos, 3, payload)
      // one sequence id consumed per wire packet (incl. the empty
      // terminator when n is an exact multiple of MaxPacket)
      val wirePackets = n / MysqlFace.MaxPacket + 1
      assert(nextSeq == 3 + wirePackets, s"seq accounting at n=$n: $nextSeq")
      // server-side reassembly round-trips AND reports the next free
      // sequence id (responses to split commands must continue it)
      val (seq, back) = MysqlFace.readPacket(
        new ByteArrayInputStream(bos.toByteArray))
      assert(seq == 3 + wirePackets && java.util.Arrays.equals(back, payload),
        s"round-trip failed at n=$n")
    }
  }

  test("auth: with a user map set, good mysql_native_password " +
      "credentials connect and query; wrong password / unknown user / " +
      "anonymous are rejected with ER_ACCESS_DENIED (1045)") {
    val authed = new MysqlFace(executor,
      users = Map("alice" -> "s3cret", "nopw" -> "")).start()
    def attempt(user: String, pw: Option[String]): (Int, Int) = {
      val c = new Client(authed.boundPort)
      try c.handshakeAuth(user, pw) finally c.close()
    }
    try {
      assert(attempt("alice", Some("s3cret"))._1 == 0x00,
        "good credentials must connect")
      val (b1, code1) = attempt("alice", Some("wrong"))
      assert(b1 == 0xff && code1 == 1045, s"wrong password: $b1/$code1")
      assert(attempt("bob", Some("s3cret"))._1 == 0xff,
        "reject-by-default: unknown users never connect")
      assert(attempt("alice", None)._1 == 0xff,
        "a password-less response must not satisfy a password'd user")
      assert(attempt("nopw", None)._1 == 0x00,
        "an empty configured password matches the empty auth response")
      // the authenticated session is a fully working command phase
      val c = new Client(authed.boundPort)
      try {
        assert(c.handshakeAuth("alice", Some("s3cret"))._1 == 0x00)
        c.comQuery("SELECT 1 AS one")
        val (names, rows) = c.readResultSet()
        assert(names == Seq("one") && rows == Seq(Seq(Some("1"))))
      } finally c.close()
      // two greetings never share a nonce (replay resistance)
      val c1 = new Client(authed.boundPort)
      val c2 = new Client(authed.boundPort)
      try {
        def nonce(cl: Client): Seq[Byte] = {
          val (_, greet) = cl.readPacket()
          val verEnd = greet.indexOf(0, 1)
          val p1 = verEnd + 1 + 4
          (greet.slice(p1, p1 + 8) ++
            greet.slice(p1 + 27, p1 + 27 + 12)).toSeq
        }
        assert(nonce(c1) != nonce(c2), "per-connection nonces must differ")
      } finally { c1.close(); c2.close() }
    } finally authed.stop()
  }

  test("auth: the default (no user map) face keeps the reference's " +
      "accept-anything posture") {
    val c = new Client()
    try assert(c.handshakeAuth("anyone", Some("whatever"))._1 == 0x00)
    finally c.close()
  }
}
