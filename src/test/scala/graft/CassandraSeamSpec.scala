package graft

import graft.operators.{CassandraSource, DocSource}
import org.scalatest.funsuite.AnyFunSuite

/** The F2 config-mapping seam (Query.java:44-143): the reference's
  * whole Cassandra connection surface — four CLI options plus four
  * hard-wired Cluster.builder tuning constants — must appear in the
  * spark-cassandra-connector option map, option for option. The live
  * read needs a connector jar this environment lacks; the MAPPING is
  * code and is asserted complete here, so a connected deployment's
  * wiring step is a constructor call, not a research project.
  */
class CassandraSeamSpec extends AnyFunSuite {

  private val authed = Tables.CassandraConf(
    host = "cas1,cas2", port = 9043,
    user = Some("sphinx"), pass = "s3cret")

  test("every reference CLI option and builder constant maps to a " +
      "connector key (Query.java:44-143 option-for-option)") {
    val m = Tables.cassandraOptions(authed)
    // --host / --port (Query.java:89-96): comma contact points + port
    assert(m("spark.cassandra.connection.host") == "cas1,cas2")
    assert(m("spark.cassandra.connection.port") == "9043")
    // --user / --pass (Query.java:99-105) -> withCredentials (Q:131)
    assert(m("spark.cassandra.auth.username") == "sphinx")
    assert(m("spark.cassandra.auth.password") == "s3cret")
    // SocketOptions.setReadTimeoutMillis(40000) (Q:133)
    assert(m("spark.cassandra.read.timeoutMS") == "40000")
    // ExponentialReconnectionPolicy(500, 300000) (Q:134)
    assert(m("spark.cassandra.connection.reconnectionDelayMS.min") == "500")
    assert(m("spark.cassandra.connection.reconnectionDelayMS.max") == "300000")
    // statement.setFetchSize(_batchSize = 1000) (Q:31,152)
    assert(m("spark.cassandra.input.fetch.sizeInRows") == "1000")
    // DowngradingConsistencyRetryPolicy (Q:136) -> its LOCAL_ONE floor
    // (the policy was removed in driver 4.x; see cassandraOptions doc)
    assert(m("spark.cassandra.input.consistency.level") == "LOCAL_ONE")
    assert(m.size == 9, s"unexpected extra keys: ${m.keySet}")
  }

  test("no-credentials conf omits auth keys AND the reconnection/" +
      "consistency tuning, mirroring the reference's unauthenticated " +
      "Cluster.builder branch (Q:137-142: contact points, port, " +
      "read timeout only)") {
    val m = Tables.cassandraOptions(Tables.CassandraConf())
    assert(!m.keySet.exists(_.startsWith("spark.cassandra.auth.")))
    // the no-auth builder sets neither the ExponentialReconnection-
    // Policy nor any retry/consistency policy — so neither do we
    assert(!m.keySet.exists(_.contains("reconnectionDelayMS")))
    assert(!m.contains("spark.cassandra.input.consistency.level"))
    // defaults mirror the reference's: localhost, 9042 (Q:92,97)
    assert(m("spark.cassandra.connection.host") == "localhost")
    assert(m("spark.cassandra.connection.port") == "9042")
    // read timeout + fetch size apply on both branches: both builders
    // carry the 40 s SocketOptions (Q:133 authed, Q:141 no-auth), and
    // the fetch size is set per Statement (Q:31,152), auth-independent
    assert(m("spark.cassandra.read.timeoutMS") == "40000")
    assert(m("spark.cassandra.input.fetch.sizeInRows") == "1000")
    assert(m.size == 4, s"unexpected extra keys: ${m.keySet}")
  }

  test("CassandraSource sits behind DocSource — the ParquetSource " +
      "swap is the entire migration step") {
    val src: DocSource = CassandraSource(authed, "ks", "facts")
    // compiled, typed, NOT invoked: load() needs the connector jar.
    assert(src.isInstanceOf[CassandraSource])
  }
}
