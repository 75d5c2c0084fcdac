"""Control-plane CLI: create-table -> sync --once -> status/history/compact
mirrors the galaxy create-DDL + job-registration flow (SURVEY.md §3.3)."""

import json

from cds_spark.cli import main, parse_schema
from cds_spark.lake.table import LakeTable
from cds_spark.sources.feed import change_feed, write_feed_files


def test_parse_schema():
    s = parse_schema("repo:string, n:long, v:double")
    assert [f.name for f in s.fields] == ["repo", "n", "v"]
    assert [f.dataType.typeName() for f in s.fields] == ["string", "long", "double"]


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip()
    assert rc == 0, out
    return out


def test_generate_create_sql_dry_run(capsys):
    """galaxy generate-create-sql analog: emits DDL + argv, executes NOTHING
    (no --root exists afterwards, no Spark session needed for --schema)."""
    out = json.loads(_run(capsys, [
        "generate-create-sql",
        "--schema", "repo:string,path:string,commit:string,n:long",
        "--pk", "repo,path", "--version-cols", "commit,_offset",
        "--name", "repos",
    ]))
    assert out["executed"] is False
    assert out["pk"] == ["repo", "path"]
    assert "CREATE TABLE repos" in out["ansi_sql"]
    assert "PRIMARY KEY (repo, path)" in out["ansi_sql"]
    assert "n BIGINT" in out["ansi_sql"]
    assert out["create_table_argv"][0] == "create-table"
    assert "--pk" in out["create_table_argv"]


def test_cli_end_to_end(spark, tmp_path, capsys):
    root = str(tmp_path / "repos")
    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")

    created = json.loads(_run(capsys, [
        "create-table", "--root", root,
        "--schema", "repo:string,path:string,commit:string,lang:string,content:string",
        "--pk", "repo,path", "--version-cols", "commit,_offset", "--buckets", "8",
    ]))
    assert created["version"] == 1

    feed = change_feed(spark, 500, n_repos=5, paths_per_repo=10, seed=3)
    write_feed_files(feed, topic, 2)

    _run(capsys, ["sync", "--root", root, "--job-id", "cli-job",
                  "--source-dir", topic, "--checkpoint", ckpt, "--once"])

    status = json.loads(_run(capsys, ["status", "--root", root]))
    assert status["version"] > 1
    assert "cli-job" in status["jobs"]
    assert any(k.startswith("fence.cli-job") for k in status["fences"])

    hist = json.loads(_run(capsys, ["history", "--root", root]))
    assert hist[0]["summary"]["operation"] == "create"

    _run(capsys, ["compact", "--root", root, "--purge-tombstones"])
    table = LakeTable.load(spark, root)
    assert table.manifest["summary"]["operation"] == "compact"
    assert table.current().count() > 0


def test_cli_lookup_and_changes(spark, tmp_path, capsys):
    root = str(tmp_path / "repos2")
    topic = str(tmp_path / "topic2")
    _run(capsys, [
        "create-table", "--root", root,
        "--schema", "repo:string,path:string,commit:string,lang:string,content:string",
        "--pk", "repo,path", "--version-cols", "commit,_offset", "--buckets", "8",
    ])
    feed = change_feed(spark, 400, n_repos=5, paths_per_repo=10, seed=9)
    write_feed_files(feed, topic, 2)
    _run(capsys, ["sync", "--root", root, "--job-id", "j2",
                  "--source-dir", topic, "--checkpoint", str(tmp_path / "ck2"), "--once"])
    table = LakeTable.load(spark, root)
    r = table.current().select("repo", "path", "content").first()

    rows = json.loads(_run(capsys, [
        "lookup", "--root", root, "--key", f"repo={r['repo']},path={r['path']}",
    ]))
    assert len(rows) == 1 and rows[0]["content"] == r["content"]

    out = _run(capsys, ["changes", "--root", root, "--from-version", "1", "--limit", "5"])
    lines = [json.loads(s) for s in out.splitlines() if s.strip()]
    assert 0 < len(lines) <= 5 and all("_change_version" in x for x in lines)

    delta_dir = str(tmp_path / "delta_out")
    meta = json.loads(_run(capsys, [
        "changes", "--root", root, "--from-version", "1", "--out", delta_dir,
    ]))
    assert meta["out"] == delta_dir
    assert spark.read.parquet(delta_dir).count() > 0

    # keyset page over the string leading-PK: first page + cursor page
    # match the collapsed state's order
    cur = sorted(
        (x["repo"], x["path"]) for x in table.current().collect()
    )
    page1 = json.loads(_run(capsys, ["page", "--root", root, "--limit", "7"]))
    assert [(x["repo"], x["path"]) for x in page1] == cur[:7]
    # composite PK: the cursor is the full tuple as a JSON list (a scalar
    # is rejected — it would skip rows sharing the leading value)
    after = (page1[-1]["repo"], page1[-1]["path"])
    page2 = json.loads(_run(capsys, [
        "page", "--root", root,
        "--after", json.dumps(list(after)), "--limit", "5",
    ]))
    assert [(x["repo"], x["path"]) for x in page2] == [
        t for t in cur if t > after
    ][:5]

    # changed-since over the string leading version (commit): equals the
    # full-read filter
    commits = sorted(x["commit"] for x in table.current().collect())
    cut = commits[len(commits) // 2]
    ch = json.loads(_run(capsys, [
        "changed-since", "--root", root, "--since", cut, "--limit", "1000",
    ]))
    exp = sorted(
        (x["repo"], x["path"]) for x in table.current().collect()
        if x["commit"] >= cut
    )
    assert sorted((x["repo"], x["path"]) for x in ch) == exp


def test_cli_sync_many(spark, tmp_path, capsys):
    jobs = []
    for i in range(2):
        root = str(tmp_path / f"smt{i}")
        topic = str(tmp_path / f"smtop{i}")
        _run(capsys, [
            "create-table", "--root", root,
            "--schema", "repo:string,path:string,commit:string,lang:string,content:string",
            "--pk", "repo,path", "--version-cols", "commit,_offset", "--buckets", "4",
        ])
        feed = change_feed(spark, 300, n_repos=3, paths_per_repo=6, seed=70 + i)
        write_feed_files(feed, topic, 2)
        jobs.append({"job_id": f"sm{i}", "table_root": root, "source_dir": topic,
                     "checkpoint_dir": str(tmp_path / f"smck{i}")})
    jf = str(tmp_path / "jobs.json")
    with open(jf, "w") as f:
        json.dump(jobs, f)
    out = json.loads(_run(capsys, ["sync-many", "--jobs", jf, "--once"]))
    assert out == {"jobs": ["sm0", "sm1"], "done": True, "failed": []}
    for i in range(2):
        t = LakeTable.load(spark, str(tmp_path / f"smt{i}"))
        assert t.current().count() > 0


def test_parse_key_spec():
    from cds_spark.cli import parse_key_spec

    pk = ["repo", "path"]
    assert parse_key_spec("repo=org/a,path=src/x.py", pk) == {
        "repo": "org/a", "path": "src/x.py"}
    # values may contain commas and '=' — only `,<pk-col>=` terminates
    assert parse_key_spec("repo=org/a,path=src/x,y=1.py", pk) == {
        "repo": "org/a", "path": "src/x,y=1.py"}
    assert parse_key_spec("path=a,b.txt,repo=r", pk) == {
        "path": "a,b.txt", "repo": "r"}
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        parse_key_spec("repo=only", pk)
    with _pytest.raises(SystemExit):
        parse_key_spec("bogus=1,repo=r,path=p", pk)
    # JSON form: unambiguous for any value bytes, incl. embedded ',<pk>='
    assert parse_key_spec('{"repo": "r", "path": "x,repo=evil.py"}', pk) == {
        "repo": "r", "path": "x,repo=evil.py"}
    with _pytest.raises(SystemExit):
        parse_key_spec('{"repo": "r"}', pk)  # missing path
    with _pytest.raises(SystemExit):
        parse_key_spec('{"repo": "r", "path": "p", "zap": 1}', pk)
    with _pytest.raises(SystemExit):
        parse_key_spec('{"broken', pk)
    # an ambiguous shorthand (value embeds ',<pk-col>=') is DETECTED via the
    # duplicate assignment it produces, not silently mis-keyed
    with _pytest.raises(SystemExit, match="JSON"):
        parse_key_spec("repo=r,path=x,repo=evil.py,path=p", pk)
    # ADVICE r3 (low): JSON null / arrays / objects / bools have no key
    # rendering — a typo'd null must error, not look up the string 'None'
    for bad in ('{"repo": null, "path": "p"}',
                '{"repo": ["r"], "path": "p"}',
                '{"repo": {"a": 1}, "path": "p"}',
                '{"repo": true, "path": "p"}'):
        with _pytest.raises(SystemExit, match="strings or numbers"):
            parse_key_spec(bad, pk)
    # numbers pass through in canonical decimal form
    assert parse_key_spec('{"repo": 3, "path": "p"}', pk) == {
        "repo": "3", "path": "p"}


def test_cli_alter_add_widen_drop(spark, tmp_path, capsys):
    """DDL executor CLI: add, widen and drop are metadata-only commits;
    dropped-column reads vanish immediately; protected columns refused."""
    import pytest
    root = str(tmp_path / "repos")
    _run(capsys, [
        "create-table", "--root", root,
        "--schema", "repo:string,path:string,commit:string,lang:string,content:string",
        "--pk", "repo,path", "--version-cols", "commit,_offset", "--buckets", "4",
    ])
    out = json.loads(_run(capsys, [
        "alter", "--root", root,
        "--add", "stars:int", "--widen", "stars:long", "--drop", "lang",
    ]))
    assert out["columns"] == ["repo", "path", "commit", "content", "stars"]
    assert out["ops"] == [{"add": ["stars"]}, {"widen": "stars:long"},
                          {"drop": "lang"}]
    t = LakeTable.load(spark, root)
    assert [f.dataType.typeName() for f in t.schema.fields
            if f.name == "stars"] == ["long"]
    with pytest.raises(SystemExit):
        main(["alter", "--root", root, "--drop", "repo"])   # PK protected
    with pytest.raises(SystemExit):
        main(["alter", "--root", root])                     # nothing to do


def test_create_table_property_passthrough(capsys, spark, tmp_path):
    """create-table --property KEY=VALUE lands in the table's properties
    (the surface for write.salt / write.salt_n / target_file_bytes)."""
    root = str(tmp_path / "proptable")
    _run(capsys, [
        "create-table", "--root", root,
        "--schema", "repo:string,path:string,commit:string,content:string",
        "--pk", "repo,path", "--version-cols", "commit,_offset",
        "--buckets", "8",
        "--property", "write.salt=auto", "--property", "write.salt_n=16",
    ])
    t = LakeTable.load(spark, root)
    assert t.properties["write.salt"] == "auto"
    assert t.properties["write.salt_n"] == "16"
    assert t.properties["merge_mode"] == "append"
