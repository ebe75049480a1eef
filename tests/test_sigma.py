"""Sigma-subset compiler: detection trees -> Column predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.sigma import apply_rules, compile_rule


def _docs(spark):
    rows = [
        (1, "powershell.exe", "cmd.exe", 4688),
        (2, "winword.exe", "powershell.exe", 4688),
        (3, "svchost.exe", "services.exe", 7045),
        (4, "mimikatz.exe", "cmd.exe", 4688),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, Image string, ParentImage string, EventID int"
    )


def test_exact_and_list(spark):
    rule = {"detection": {"sel": {"Image": ["powershell.exe", "mimikatz.exe"]},
                          "condition": "sel"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {1, 4}


def test_modifiers_and_wildcards(spark):
    rule = {"detection": {
        "a": {"Image|endswith": ".exe", "ParentImage|contains": "cmd"},
        "b": {"Image": "win*"},
        "condition": "a or b"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {1, 2, 4}


def test_condition_grammar(spark):
    rule = {"detection": {
        "sel1": {"EventID": 4688},
        "sel2": {"Image|startswith": "power"},
        "condition": "sel1 and not sel2"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {2, 4}


def test_one_of_them(spark):
    rule = {"detection": {
        "sel_a": {"Image": "svchost.exe"},
        "sel_b": {"EventID": 7045},
        "condition": "all of them"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {3}
    rule["detection"]["condition"] = "1 of sel*"
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {3}


def test_apply_rules_one_pass(spark):
    rules = [
        {"id": "r-power", "detection": {"s": {"Image|startswith": "power"}, "condition": "s"}},
        {"id": "r-4688", "detection": {"s": {"EventID": 4688}, "condition": "s"}},
    ]
    out = {(r["doc_id"], r["rule_id"]) for r in apply_rules(_docs(spark), rules).collect()}
    assert out == {(1, "r-power"), (1, "r-4688"), (2, "r-4688"), (4, "r-4688")}


def test_unknown_selection_raises(spark):
    rule = {"detection": {"sel": {"Image": "x"}, "condition": "nope"}}
    with pytest.raises(ValueError):
        compile_rule(rule)


# ---------------------------------------------------------------------------
# Sysmon logsource pipeline
# ---------------------------------------------------------------------------

def _sysmon_events(spark):
    rows = [
        # (id, EventID, Image, CommandLine, DestinationPort, DestinationIp)
        (1, 1, r"C:\tools\mimikatz.exe", "mimikatz.exe privilege::debug", None, None),
        (2, 11, r"C:\tools\mimikatz.exe", "mimikatz.exe privilege::debug", None, None),
        (3, 3, "chrome.exe", None, 443, "10.0.0.5"),
        (4, 3, "beacon.exe", None, 4444, "203.0.113.9"),
        (5, 1, "beacon.exe", "beacon.exe -connect", 4444, None),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, EventID int, Image string, CommandLine string, "
        "DestinationPort int, DestinationIp string",
    )


def test_sysmon_rename_table_pinned():
    # the driver-side mapping tables ARE the contract — pin the rows the
    # fixtures (and any real rule replay) depend on
    from sigraph_spark.operators.sigma import (
        SYSMON_CATEGORY_EVENT_IDS, SYSMON_FIELD_RENAMES,
    )

    assert SYSMON_CATEGORY_EVENT_IDS["process_creation"] == (1,)
    assert SYSMON_CATEGORY_EVENT_IDS["network_connection"] == (3,)
    assert SYSMON_CATEGORY_EVENT_IDS["registry_event"] == (12, 13, 14)
    assert SYSMON_CATEGORY_EVENT_IDS["wmi_event"] == (19, 20, 21)
    # Sigma taxonomy name + legacy alias both gate on EID 24
    assert SYSMON_CATEGORY_EVENT_IDS["clipboard_change"] == (24,)
    assert SYSMON_CATEGORY_EVENT_IDS["clipboard_capture"] == (24,)
    assert SYSMON_CATEGORY_EVENT_IDS["file_delete"] == (23, 26)
    assert SYSMON_FIELD_RENAMES["network_connection"]["dst_port"] == "DestinationPort"
    assert SYSMON_FIELD_RENAMES["network_connection"]["dst_ip"] == "DestinationIp"
    assert SYSMON_FIELD_RENAMES["dns_query"]["query"] == "QueryName"


def test_sysmon_category_gates_event_id(spark):
    # the same detection matches rows 1,2,5 without the pipeline; WITH the
    # process_creation category only sysmon EventID 1 rows survive
    from sigraph_spark.operators.sigma import compile_rule, compile_sysmon_rule

    rule = {
        "logsource": {"product": "windows", "category": "process_creation"},
        "detection": {"sel": {"Image|endswith": ".exe",
                              "CommandLine|contains": "mimikatz"},
                      "condition": "sel"},
    }
    ev = _sysmon_events(spark)
    bare = {r["doc_id"] for r in ev.filter(compile_rule(rule)).collect()}
    piped = {r["doc_id"] for r in ev.filter(compile_sysmon_rule(rule)).collect()}
    assert bare == {1, 2}
    assert piped == {1}  # the EventID 11 (file_event) collision is excluded


def test_sysmon_generic_field_renames(spark):
    # a rule written in Sigma's generic network taxonomy (dst_port/dst_ip)
    # compiles against Sysmon's PascalCase columns
    from sigraph_spark.operators.sigma import compile_sysmon_rule

    rule = {
        "logsource": {"category": "network_connection"},
        "detection": {"sel": {"dst_port": 4444}, "condition": "sel"},
    }
    got = {
        r["doc_id"]
        for r in _sysmon_events(spark).filter(compile_sysmon_rule(rule)).collect()
    }
    assert got == {4}  # doc 5 has port 4444 but EventID 1, not 3


def test_sysmon_unknown_category_passthrough(spark):
    # categories outside the sysmon taxonomy compile as plain detection
    from sigraph_spark.operators.sigma import compile_sysmon_rule

    rule = {
        "logsource": {"category": "webserver"},
        "detection": {"sel": {"Image|contains": "beacon"}, "condition": "sel"},
    }
    got = {
        r["doc_id"]
        for r in _sysmon_events(spark).filter(compile_sysmon_rule(rule)).collect()
    }
    assert got == {4, 5}


def test_sysmon_field_prefix_composes(spark):
    # EventID honors field_prefix exactly like detection fields (the
    # reference prefixes the WHOLE query string, rule/session.py:110-114)
    from sigraph_spark.operators.sigma import compile_sysmon_rule

    ev = _sysmon_events(spark).select(
        "doc_id",
        F.struct(
            F.struct("EventID", "Image", "CommandLine").alias("Metadata")
        ).alias("raw_data"),
    )
    rule = {
        "logsource": {"category": "process_creation"},
        "detection": {"sel": {"CommandLine|contains": "mimikatz"},
                      "condition": "sel"},
    }
    pred = compile_sysmon_rule(rule, field_prefix="raw_data.Metadata")
    assert {r["doc_id"] for r in ev.filter(pred).collect()} == {1}


def test_apply_sysmon_rules_one_pass(spark):
    from sigraph_spark.operators.sigma import apply_sysmon_rules

    rules = [
        {"id": "proc-mimi",
         "logsource": {"category": "process_creation"},
         "detection": {"sel": {"CommandLine|contains": "mimikatz"},
                       "condition": "sel"}},
        {"id": "net-c2",
         "logsource": {"category": "network_connection"},
         "detection": {"sel": {"dst_port": [4444, 8443]}, "condition": "sel"}},
    ]
    got = {
        (r["doc_id"], r["rule_id"])
        for r in apply_sysmon_rules(_sysmon_events(spark), rules).collect()
    }
    assert got == {(1, "proc-mimi"), (4, "net-c2")}


def test_sysmon_yaml_rule_end_to_end(spark):
    """Real-shaped Sigma YAML through the full path: parse_rules_yaml ->
    compile_sysmon_rule -> filter (the reference's upload -> sysmon
    pipeline -> backend flow as one batch predicate)."""
    from sigraph_spark.operators.sigma import (
        compile_sysmon_rule, parse_rules_yaml,
    )

    yaml_text = """
title: Suspicious Mimikatz Execution
id: r-yaml-1
status: test
logsource:
  product: windows
  category: process_creation
detection:
  sel_img:
    Image|endswith: '\\mimikatz.exe'
  sel_cmd:
    CommandLine|contains:
      - 'privilege::debug'
      - 'sekurlsa::'
  condition: sel_img and sel_cmd
level: high
"""
    rules = parse_rules_yaml([yaml_text])
    assert len(rules) == 1 and rules[0]["id"] == "r-yaml-1"
    got = {
        r["doc_id"]
        for r in _sysmon_events(spark)
        .filter(compile_sysmon_rule(rules[0]))
        .collect()
    }
    assert got == {1}  # EventID gate excludes the file_event collision (2)


def test_base64_and_base64offset_modifiers(spark):
    import base64

    from sigraph_spark.operators.sigma import (
        _base64offset_variants, compile_rule,
    )

    # self-verify the offset table against REAL encodes: the variant for
    # offset k must be a substring of b64(prefix_of_len_k + value + tail)
    val = "secret42"
    variants = _base64offset_variants(val)
    for k in range(3):
        stream = base64.b64encode(
            (b"z" * k) + val.encode() + b"trailing-bytes"
        ).decode()
        assert variants[k] in stream, (k, variants[k], stream)
    # and a stream NOT containing the value matches no variant
    clean = base64.b64encode(b"nothing to see here").decode()
    assert not any(v in clean for v in variants)

    rows = [
        (1, base64.b64encode(b"xsecret42y").decode()),
        (2, base64.b64encode(b"whoami").decode()),
        (3, "plain text"),
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    off = {"id": "t", "detection": {
        "sel": {"payload|base64offset|contains": "secret42"},
        "condition": "sel"}}
    assert [r["id"] for r in df.filter(compile_rule(off)).collect()] == [1]
    exact = {"id": "t", "detection": {
        "sel": {"payload|base64": "whoami"}, "condition": "sel"}}
    assert [r["id"] for r in df.filter(compile_rule(exact)).collect()] == [2]


def test_windash_modifier(spark):
    from sigraph_spark.operators.sigma import compile_rule

    rows = [(1, "tool -f quiet"), (2, "tool /f quiet"),
            (3, "tool —f quiet"), (4, "tool -x loud")]
    df = spark.createDataFrame(rows, "id long, cmd string")
    rule = {"id": "t", "detection": {
        "sel": {"cmd|windash|contains": "-f quiet"}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(rule)).collect())
    assert got == [1, 2, 3]


def test_cidr_modifier_and_guard(spark):
    from sigraph_spark.operators.sigma import compile_rule

    rows = [(1, "10.1.2.3"), (2, "10.255.0.1"), (3, "11.0.0.1"),
            (4, "not-an-ip"), (5, "300.0.0.1"), (6, "192.168.7.9")]
    df = spark.createDataFrame(rows, "id long, ip string")
    rule = {"id": "t", "detection": {
        "sel": {"ip|cidr": "10.0.0.0/8"}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(rule)).collect())
    assert got == [1, 2]
    r24 = {"id": "t", "detection": {
        "sel": {"ip|cidr": "192.168.7.0/24"}, "condition": "sel"}}
    assert [r["id"] for r in df.filter(compile_rule(r24)).collect()] == [6]


def test_unknown_or_invalid_modifiers_raise(spark):
    import pytest

    from sigraph_spark.operators.sigma import compile_rule

    for det in (
        {"sel": {"f|base64z": "x"}, "condition": "sel"},
        {"sel": {"f|base64offset": "x"}, "condition": "sel"},  # no contains
        {"sel": {"f|cidr": "::1/128"}, "condition": "sel"},    # ipv6
        {"sel": {"f|windash|contains": "-a -b -c -d sites"},
         "condition": "sel"},                                  # >3 sites
    ):
        with pytest.raises(ValueError):
            compile_rule({"id": "t", "detection": det})


def test_windash_slash_and_unicode_sites_expand(spark):
    # ADVICE r4: '/' and unicode dashes in the RULE value are flag
    # sites too (pySigma semantics) — a slash-authored rule must still
    # match dash-authored events and vice versa
    from sigraph_spark.operators.sigma import compile_rule

    rows = [(1, "tool -f quiet"), (2, "tool /f quiet"),
            (3, "tool —f quiet"), (4, "tool .f quiet")]
    df = spark.createDataFrame(rows, "id long, cmd string")
    slash_rule = {"id": "t", "detection": {
        "sel": {"cmd|windash|contains": "/f quiet"}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(slash_rule)).collect())
    assert got == [1, 2, 3]
    emdash_rule = {"id": "t", "detection": {
        "sel": {"cmd|windash|contains": "—f quiet"}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(emdash_rule)).collect())
    assert got == [1, 2, 3]


def test_comparison_modifiers(spark):
    from sigraph_spark.operators.sigma import compile_rule

    rows = [(1, "80", 80), (2, "443", 443), (3, "8080", 8080),
            (4, "not-a-number", 0)]
    df = spark.createDataFrame(rows, "id long, port_s string, port long")
    def ids(field, mod, val):
        rule = {"id": "t", "detection": {
            "sel": {f"{field}|{mod}": val}, "condition": "sel"}}
        return sorted(r["id"] for r in df.filter(compile_rule(rule)).collect())
    # string-typed field: numeric comparison, non-numeric rows drop out
    assert ids("port_s", "gt", 100) == [2, 3]
    assert ids("port_s", "gte", 443) == [2, 3]
    assert ids("port_s", "lt", 443) == [1]
    assert ids("port_s", "lte", 443) == [1, 2]
    # numeric-typed field works identically
    assert ids("port", "gt", 100) == [2, 3]
    # numeric string values accepted
    assert ids("port_s", "gt", "100") == [2, 3]


def test_comparison_modifier_errors(spark):
    import pytest

    from sigraph_spark.operators.sigma import compile_rule

    for det in (
        {"sel": {"f|gt": "not-numeric"}, "condition": "sel"},
        {"sel": {"f|base64|gt": 5}, "condition": "sel"},
        {"sel": {"f|gt|lt": 5}, "condition": "sel"},  # conflicting matchers
    ):
        with pytest.raises(ValueError):
            compile_rule({"id": "t", "detection": det})


def test_utf16_encoding_modifiers(spark):
    import base64 as b64

    from sigraph_spark.operators.sigma import compile_rule

    enc = lambda b: b64.b64encode(b).decode()  # noqa: E731
    rows = [
        (1, enc("powershell".encode("utf-16le"))),
        (2, enc("powershell".encode("utf-16be"))),
        (3, enc(b"\xff\xfe" + "powershell".encode("utf-16le"))),
        (4, enc(b"powershell")),  # plain utf-8, must NOT match utf16 forms
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    def ids(mods):
        rule = {"id": "t", "detection": {
            "sel": {f"payload|{mods}": "powershell"}, "condition": "sel"}}
        return sorted(r["id"] for r in df.filter(compile_rule(rule)).collect())
    assert ids("utf16le|base64") == [1]
    assert ids("wide|base64") == [1]       # wide is the utf16le alias
    assert ids("utf16be|base64") == [2]
    assert ids("utf16|base64") == [3]      # utf16 prepends the BOM
    assert ids("base64") == [4]


def test_utf16_base64offset_contains(spark):
    import base64 as b64

    from sigraph_spark.operators.sigma import compile_rule

    # the needle sits at plaintext offsets 0/1/2 inside a larger wide
    # string — all three alignments must match via the offset variants
    needle = "evil".encode("utf-16le")
    rows = [
        (i, b64.b64encode(b"\x00" * i + needle + b"tail").decode())
        for i in range(3)
    ] + [(9, b64.b64encode(b"clean payload").decode())]
    df = spark.createDataFrame(rows, "id long, payload string")
    rule = {"id": "t", "detection": {
        "sel": {"payload|wide|base64offset|contains": "evil"},
        "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(rule)).collect())
    assert got == [0, 1, 2]


def test_encoding_modifier_errors(spark):
    import pytest

    from sigraph_spark.operators.sigma import compile_rule

    for det in (
        # bytes with no following base64 transform
        {"sel": {"f|utf16le|contains": "x"}, "condition": "sel"},
        {"sel": {"f|wide": "x"}, "condition": "sel"},
        # windash cannot run over bytes
        {"sel": {"f|utf16le|windash|base64": "-x"}, "condition": "sel"},
        # double encoding
        {"sel": {"f|utf16le|utf16be|base64": "x"}, "condition": "sel"},
    ):
        with pytest.raises(ValueError):
            compile_rule({"id": "t", "detection": det})


def test_exists_modifier(spark):
    from sigraph_spark.operators.sigma import compile_rule

    rows = [(1, "a"), (2, None), (3, "c"), (4, None)]
    df = spark.createDataFrame(rows, "id long, f string")
    present = {"id": "t", "detection": {
        "sel": {"f|exists": True}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(present)).collect())
    assert got == [1, 3]
    absent = {"id": "t", "detection": {
        "sel": {"f|exists": False}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(absent)).collect())
    assert got == [2, 4]


def test_exists_modifier_errors(spark):
    import pytest

    from sigraph_spark.operators.sigma import compile_rule

    for det in (
        # non-boolean value
        {"sel": {"f|exists": "yes"}, "condition": "sel"},
        # combining with anything else
        {"sel": {"f|exists|contains": True}, "condition": "sel"},
        {"sel": {"f|base64|exists": True}, "condition": "sel"},
    ):
        with pytest.raises(ValueError):
            compile_rule({"id": "t", "detection": det})


def test_fieldref_modifier(spark):
    from sigraph_spark.operators.sigma import compile_rule

    rows = [
        (1, "cmd.exe", "cmd.exe", r"C:\tools\cmd.exe run"),
        (2, "cmd.exe", "powershell.exe", r"C:\tools\powershell.exe run"),
        (3, "svchost.exe", "svchost.exe", "unrelated"),
        (4, None, "cmd.exe", None),  # NULL side -> non-match, not error
    ]
    df = spark.createDataFrame(
        rows, "id long, Image string, ParentImage string, CommandLine string"
    )
    eq = {"id": "t", "detection": {
        "sel": {"Image|fieldref": "ParentImage"}, "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(eq)).collect())
    assert got == [1, 3]
    contains = {"id": "t", "detection": {
        "sel": {"CommandLine|fieldref|contains": "ParentImage"},
        "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(contains)).collect())
    assert got == [1, 2]
    # list of refs ORs; |all ANDs
    any_of = {"id": "t", "detection": {
        "sel": {"Image|fieldref": ["ParentImage", "CommandLine"]},
        "condition": "sel"}}
    got = sorted(r["id"] for r in df.filter(compile_rule(any_of)).collect())
    assert got == [1, 3]


def test_fieldref_modifier_errors(spark):
    import pytest

    from sigraph_spark.operators.sigma import compile_rule

    for det in (
        # value transforms make no sense over a column reference
        {"sel": {"f|fieldref|base64": "g"}, "condition": "sel"},
        {"sel": {"f|windash|fieldref": "g"}, "condition": "sel"},
        # non-string reference
        {"sel": {"f|fieldref": 7}, "condition": "sel"},
        # conflicting match modifiers
        {"sel": {"f|fieldref|contains|endswith": "g"}, "condition": "sel"},
    ):
        with pytest.raises(ValueError):
            compile_rule({"id": "t", "detection": det})
