package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** The casbin-compatible policy engine (reference: accounts/casbin.go —
  * user-supplied Model/Policy files in casbin's public PERM format decide
  * Enforce(user, graph, operation)). Fixtures below are the canonical
  * model shapes from casbin's public documentation. */
class CasbinSpec extends AnyFunSuite {

  private val aclModel =
    """
[request_definition]
r = sub, obj, act

[policy_definition]
p = sub, obj, act

[policy_effect]
e = some(where (p.eft == allow))

[matchers]
m = r.sub == p.sub && r.obj == p.obj && r.act == p.act
"""

  private val rbacModel =
    """
[request_definition]
r = sub, obj, act

[policy_definition]
p = sub, obj, act

[role_definition]
g = _, _

[policy_effect]
e = some(where (p.eft == allow))

[matchers]
m = g(r.sub, p.sub) && keyMatch(r.obj, p.obj) && (r.act == p.act || p.act == "*")
"""

  test("ACL: exact-triple matching, nothing implicit") {
    val e = Casbin.enforcer(aclModel,
      """p, alice, graph1, read
        |p, bob, graph1, write""".stripMargin)
    assert(e.enforce("alice", "graph1", "read"))
    assert(!e.enforce("alice", "graph1", "write"))
    assert(!e.enforce("bob", "graph2", "write"))
    assert(!e.enforce("carol", "graph1", "read"))
  }

  test("RBAC: transitive role inheritance and keyMatch wildcards") {
    val e = Casbin.enforcer(rbacModel,
      """p, data_admin, *, *
        |p, data_reader, graphs/*, read
        |g, alice, data_admin
        |g, bob, data_reader
        |g, admin_group, data_admin
        |g, carol, admin_group""".stripMargin)
    assert(e.enforce("alice", "graph1", "write"))
    assert(e.enforce("bob", "graphs/g1", "read"))
    assert(!e.enforce("bob", "graphs/g1", "write"))
    assert(!e.enforce("bob", "private/g1", "read"))
    // carol -> admin_group -> data_admin, two hops
    assert(e.enforce("carol", "anything", "query"))
    // a role name used directly as the subject also works (reflexive g)
    assert(e.enforce("data_reader", "graphs/g2", "read"))
    assert(!e.enforce("mallory", "graphs/g1", "read"))
  }

  test("RBAC with domains: role links scope to their domain") {
    val model =
      """
[request_definition]
r = sub, dom, obj, act

[policy_definition]
p = sub, dom, obj, act

[role_definition]
g = _, _, _

[policy_effect]
e = some(where (p.eft == allow))

[matchers]
m = g(r.sub, p.sub, r.dom) && r.dom == p.dom && r.obj == p.obj && r.act == p.act
"""
    val e = Casbin.enforcer(model,
      """p, admin, tenant1, graph1, read
        |p, admin, tenant2, graph2, read
        |g, alice, admin, tenant1""".stripMargin)
    assert(e.enforce("alice", "tenant1", "graph1", "read"))
    assert(!e.enforce("alice", "tenant2", "graph2", "read")) // wrong domain
  }

  test("deny-override: an allow loses to a matching deny") {
    val model =
      """
[request_definition]
r = sub, obj, act

[policy_definition]
p = sub, obj, act, eft

[policy_effect]
e = some(where (p.eft == allow)) && !some(where (p.eft == deny))

[matchers]
m = r.sub == p.sub && r.obj == p.obj && r.act == p.act
"""
    val e = Casbin.enforcer(model,
      """p, alice, graph1, read, allow
        |p, alice, graph1, write, allow
        |p, alice, graph1, write, deny""".stripMargin)
    assert(e.enforce("alice", "graph1", "read"))
    assert(!e.enforce("alice", "graph1", "write"))
  }

  test("priority effect: first matching policy row decides") {
    val model =
      """
[request_definition]
r = sub, obj, act

[policy_definition]
p = sub, obj, act, eft

[policy_effect]
e = priority(p.eft) || deny

[matchers]
m = r.sub == p.sub && keyMatch(r.obj, p.obj) && r.act == p.act
"""
    val e = Casbin.enforcer(model,
      """p, alice, secret/*, read, deny
        |p, alice, *, read, allow""".stripMargin)
    assert(e.enforce("alice", "public/g", "read"))
    assert(!e.enforce("alice", "secret/g", "read"))
  }

  test("superuser matcher clause works even with an empty policy set") {
    val model = aclModel.replace(
      "m = r.sub == p.sub && r.obj == p.obj && r.act == p.act",
      "m = r.sub == p.sub && r.obj == p.obj && r.act == p.act || r.sub == \"root\"")
    val e = Casbin.enforcer(model, "")
    assert(e.enforce("root", "anything", "write"))
    assert(!e.enforce("alice", "anything", "read"))
  }

  test("builtins: keyMatch / keyMatch2 / regexMatch / globMatch semantics") {
    assert(Casbin.keyMatch("/foo/bar", "/foo/*"))
    assert(Casbin.keyMatch("anything", "*"))
    assert(!Casbin.keyMatch("/foobar", "/foo"))
    assert(Casbin.keyMatch2("/res/123", "/res/:id"))
    assert(!Casbin.keyMatch2("/res/123/x", "/res/:id"))
    assert(Casbin.keyMatch2("/res/123/x", "/res/*"))
    assert(Casbin.regexMatch("graph_7", "^graph_[0-9]+$"))
    assert(Casbin.regexMatch("xgraph_7y", "graph_[0-9]")) // unanchored find
    assert(Casbin.globMatch("graph1", "graph*"))
    assert(!Casbin.globMatch("a/b", "a*")) // * does not cross separators
  }

  test("malformed model and policy inputs fail loudly") {
    intercept[IllegalArgumentException](Casbin.parseModel("[matchers]\nm = r.sub =="))
    intercept[IllegalArgumentException](Casbin.parseModel("no sections here"))
    intercept[IllegalArgumentException](
      Casbin.enforcer(aclModel, "g, alice, admin")) // g undeclared in model
    intercept[IllegalArgumentException](
      Casbin.enforcer(aclModel, "q, alice, graph1, read"))
    val e = Casbin.enforcer(aclModel, "p, alice, graph1, read")
    intercept[IllegalArgumentException](e.enforce("alice", "graph1")) // arity
  }

  test("policy CSV: quoted fields keep commas; arity mismatches are loud") {
    // a regexMatch pattern containing a comma must survive as one field
    val model =
      """
[request_definition]
r = sub, obj, act

[policy_definition]
p = sub, obj, act

[policy_effect]
e = some(where (p.eft == allow))

[matchers]
m = r.sub == p.sub && regexMatch(r.obj, p.obj) && r.act == p.act
"""
    val e = Casbin.enforcer(model, """p, alice, "^g[a-z]{1,3}$", read""")
    assert(e.enforce("alice", "gab", "read"))
    assert(!e.enforce("alice", "gabcd", "read"))
    // doubled quote inside a quoted field is a literal quote
    assert(Casbin.splitCsvLine("""p, a, "say ""hi"", ok", x""") ==
      Seq("p", "a", """say "hi", ok""", "x"))
    // unterminated quote is loud
    intercept[IllegalArgumentException](Casbin.splitCsvLine("""p, a, "oops"""))
    // bare quote mid-field is loud (Go encoding/csv ErrBareQuote), not a
    // silent open-quote that would swallow the following comma
    val bare = intercept[IllegalArgumentException](Casbin.splitCsvLine("""p, a"b, c"""))
    assert(bare.getMessage.contains("bare"), bare.getMessage)
    // arity mismatches error instead of padding/truncating (a mangled
    // deny row must not silently fail open)
    intercept[IllegalArgumentException](
      Casbin.enforcer(aclModel, "p, alice, graph1")) // too few
    intercept[IllegalArgumentException](
      Casbin.enforcer(aclModel, "p, alice, graph1, read, deny")) // too many (no eft declared)
    intercept[IllegalArgumentException](
      Casbin.enforcer(rbacModel, "g, alice, admin, extra")) // g arity
    // declared trailing eft may be omitted per row (defaults to allow)
    val eftModel = aclModel.replace("p = sub, obj, act", "p = sub, obj, act, eft")
    val e2 = Casbin.enforcer(eftModel, "p, alice, graph1, read")
    assert(e2.enforce("alice", "graph1", "read"))
  }

  test("REST server gates routes through a casbin-backed Auth end-to-end") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val spark = graft.SparkTestSession.spark
    val auth = GraftServer.Auth(
      credentials = Seq(GraftServer.Credential("admin", "secret"),
        GraftServer.Credential("bob", "pw")),
      policies = Nil,
      access = Some(Casbin.enforcer(rbacModel,
        """p, data_admin, *, *
          |p, data_reader, g1, read
          |p, data_reader, g1, query
          |g, admin, data_admin
          |g, bob, data_reader""".stripMargin)))
    val srv = new GraftServer(spark, 0, Some(auth))
    srv.start()
    try {
      val c = HttpClient.newHttpClient()
      val p = srv.boundPort
      def basic(u: String, pw: String) =
        "Basic " + java.util.Base64.getEncoder.encodeToString(s"$u:$pw".getBytes)
      def req(method: String, path: String, user: String, pw: String, body: String = "") = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p$path"))
          .header("Authorization", basic(user, pw))
        c.send((method match {
          case "GET" => b.GET()
          case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
        }).build(), HttpResponse.BodyHandlers.ofString())
      }
      assert(req("POST", "/v1/graph/g1", "admin", "secret").statusCode() == 200)
      assert(req("POST", "/v1/graph/g1/vertex", "admin", "secret",
        """{"gid":"v1","label":"X"}""").statusCode() == 200)
      assert(req("POST", "/v1/graph/g1/query", "bob", "pw",
        """{"query":"V().count()"}""").statusCode() == 200)
      assert(req("POST", "/v1/graph/g1/vertex", "bob", "pw",
        """{"gid":"v2","label":"X"}""").statusCode() == 403)
      assert(req("POST", "/v1/graph/g2", "bob", "pw").statusCode() == 403)
    } finally srv.stop()
  }

  test("GraftServer.Auth delegates enforcement to a casbin access backend") {
    val auth = GraftServer.Auth(
      credentials = Seq(GraftServer.Credential("alice", "pw")),
      policies = Nil, // ignored when access is set
      access = Some(Casbin.enforcer(rbacModel,
        """p, data_admin, *, *
          |g, alice, data_admin""".stripMargin)))
    assert(auth.enforce("alice", "g1", "write"))
    assert(!auth.enforce("eve", "g1", "read"))
  }
}
