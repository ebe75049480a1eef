"""Typed-literal extraction (operators/literals.py)."""

from conftest import spark  # noqa: F401

from sigraph_spark.operators.literals import typed_literals

SCHEMA = "url string, actor string, verb string, object string"


def _run(spark, objects):
    rows = [(f"d{i}", "a", "v", o) for i, o in enumerate(objects)]
    t = spark.createDataFrame(rows, SCHEMA)
    return {
        (r["littype"], r["canonical"]): (r["n_mentions"], r["n_docs"])
        for r in typed_literals(t).collect()
    }


def test_typed_literals_classification(spark):
    out = _run(spark, [
        "to https://cdn.badhost.example/gate.php for tasking",
        "to 185.220.101.45:443 every 60 seconds",
        "to evil[.]command-server[.]example on port 8443",
        "SHA256 E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855 seen",
        "C:\\tmp\\mod.dll,EntryPoint silently",
        "itself to \\\\fileserv\\share\\w.exe",
        "privileges via CVE-2024-21338",
        "HKLM\\SYSTEM\\CurrentControlSet\\Services\\WinDefend\\Start",
        "powershell.exe -enc SGVsbG8=",
    ])
    assert ("url", "https://cdn.badhost.example/gate.php") in out
    # ip canonical strips the port
    assert ("ipv4", "185.220.101.45") in out
    # defanged domain re-fangs
    assert ("domain", "evil.command-server.example") in out
    # hash lowers
    assert ("sha256", "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855") in out
    # comma splits the winpath from the entrypoint token
    assert ("winpath", "c:\\tmp\\mod.dll") in out
    assert ("unc", "\\\\fileserv\\share\\w.exe") in out
    assert ("cve", "cve-2024-21338") in out
    assert ("registry", "hklm\\system\\currentcontrolset\\services\\windefend\\start") in out
    assert ("file", "powershell.exe") in out
    # plain words and numbers are untyped
    assert not any(c in ("to", "60", "silently") for _, c in out)


def test_predicate_ranges_modal_type(spark):
    from sigraph_spark.operators.literals import predicate_ranges

    rows = [
        ("d1", "a", "exfiltrate", "to evil.example quietly"),
        ("d2", "a", "exfiltrate", "to drop.other.example fast"),
        ("d3", "a", "exfiltrate", "something untyped"),
        ("d4", "a", "create", "C:\\tmp\\a.exe then C:\\tmp\\b.exe"),
        # leftmost typed token wins within a phrase: url before domain
        ("d5", "a", "fetch", "http://x.example/a grabbed from y.example"),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    out = {r["predicate"]: (r["range_type"], r["n_objects"], r["n_types"])
           for r in predicate_ranges(t).collect()}
    assert out["exfiltrate"] == ("domain", 3, 2)
    assert out["create"] == ("winpath", 1, 1)
    assert out["fetch"] == ("url", 1, 1)


def test_typed_literals_priority_and_counts(spark):
    # url beats domain/file; counts aggregate across docs and mentions
    rows = [
        ("d1", "a", "v", "http://staging.evil.example/p.bin again http://staging.evil.example/p.bin"),
        ("d2", "a", "v", "http://staging.evil.example/p.bin"),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    out = {(r["littype"], r["canonical"]): (r["n_mentions"], r["n_docs"])
           for r in typed_literals(t).collect()}
    assert out[("url", "http://staging.evil.example/p.bin")] == (3, 2)
    assert not any(lt == "domain" for lt, _ in out)
