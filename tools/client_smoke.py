#!/usr/bin/env python3
"""Stock-client validation: drive a running GraftServer with the reference's
own shipped python client (gripql) — no graft-side code in the loop — and
check golden conformance counts over the SWAPI fixture (mirroring
conformance/tests/ot_basic.py, ot_count.py, ot_has.py, ot_aggregations.py,
ot_distinct.py, ot_bulk.py patterns).

Usage: client_smoke.py <port> <swapi_fixture_dir>
Exit 0 = all checks passed; nonzero prints each FAIL line.
"""
import json
import sys

sys.path.insert(0, "/root/reference/gripql/python")
import gripql  # noqa: E402

failures = []


def check(name, got, want):
    if got != want:
        failures.append("FAIL %s: got %r want %r" % (name, got, want))
    else:
        print("ok %s" % name)


def main(port, fixture_dir):
    url = "http://127.0.0.1:%s" % port
    conn = gripql.Connection(url)
    conn.addGraph("swapi")
    check("listGraphs", "swapi" in conn.listGraphs(), True)

    # vertices through the client-streaming bulk surface (ot_bulk pattern)
    bulk = gripql.BulkAdd(url, "swapi")
    with open(fixture_dir + "/swapi.vertices") as f:
        for line in f:
            v = json.loads(line)
            bulk.addVertex(v["gid"], v["label"], v.get("data", {}))
    res = bulk.execute()
    check("bulk insertCount", res.get("insertCount"), 39)
    check("bulk errorCount", res.get("errorCount"), 0)

    # edges through the unary edit surface (keeps edge gids — the stock
    # BulkAdd builder drops them to the top level of the payload)
    G = conn.graph("swapi")
    with open(fixture_dir + "/swapi.edges") as f:
        for line in f:
            e = json.loads(line)
            G.addEdge(e["from"], e["to"], e["label"], e.get("data", {}), gid=e.get("gid"))

    q = G.query()

    # ot_count / ot_basic
    check("V().count", list(q.V().count())[0]["count"], 39)
    check("E().count", list(q.E().count())[0]["count"], 144)
    check("V(id)", len(list(q.V("Character:1"))), 1)
    check("V(missing)", len(list(q.V("non-existent"))), 0)
    check("E(id)", len(list(q.E("Film:1-characters-Character:1"))), 1)

    # traversals
    check("out", len(list(q.V("Starship:12").out())), 5)
    check("out(label)", len(list(q.V("Starship:12").out("pilots"))), 4)
    check("in(label)", len(list(q.V("Starship:12").in_("starships"))), 5)
    check("both", len(list(q.V("Starship:12").both())), 10)
    check("outE", list(q.V("Character:1").outE().count())[0]["count"], 4)
    check("three-hop", list(q.V("Film:1").out().out().out().count())[0]["count"], 1814)

    # ot_has: eq / gt / and_
    check("has eq", len(list(q.V().has(gripql.eq("name", "Tatooine")))), 1)
    check("has gt", len(list(q.V().has(gripql.gt("diameter", 10000)))), 3)
    check("has and", len(list(
        q.V().has(gripql.and_(gripql.eq("_label", "Planet"), gripql.eq("climate", "arid"))))), 1)

    # paging
    check("limit", len(list(q.V().limit(3))), 3)
    check("skip+limit", len(list(q.V().skip(3).limit(3))), 3)
    check("range", len(list(q.V().range(3, 5))), 2)

    # ot_distinct
    check("distinct(label)", len(list(q.V().distinct("_label"))), 6)

    # ot_aggregations: eye_color terms over all vertices
    eye = {"brown": 4, "blue": 6, "red": 2, "yellow": 2,
           "black": 1, "blue-gray": 1, "hazel": 1, "orange": 1}
    rows = list(q.V().aggregate(gripql.term("simple-agg", "eye_color")))
    check("term agg keys", len(rows), 8)
    for row in rows:
        check("term agg name %s" % row["key"], row["name"], "simple-agg")
        check("term agg %s" % row["key"], row["value"], eye[row["key"]])

    # fields projection keeps gid + requested field
    row = list(q.V("Planet:1").fields(["name"]))[0]
    check("fields name", row["data"].get("name"), "Tatooine")

    # vertex data round-trip through the point-read route
    check("getVertex", G.getVertex("Planet:1")["data"]["name"], "Tatooine")

    # ot_labels via the label listing route (both halves of the response)
    labels = G.listLabels()
    check("vertexLabels", sorted(labels["vertexLabels"]),
          ["Character", "Film", "Planet", "Species", "Starship", "Vehicle"])
    check("edgeLabels", sorted(labels["edgeLabels"]),
          ["characters", "films", "homeworld", "people", "pilots",
           "planets", "residents", "species", "starships", "vehicles"])

    # ot_index pattern: advisory index add + listing through the client
    G.addIndex("Character", "eye_color")
    idx = G.listIndices()
    check("listIndices", [(i["label"], i["field"]) for i in idx],
          [("Character", "eye_color")])

    if failures:
        print("\n".join(failures))
        sys.exit(1)
    print("ALL %s CHECKS PASSED" % "client-smoke")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
