"""HOCON-subset parser tests — the grammar the reference's example
configs actually exercise (braced/unbraced roots, ``:``/``=``/implicit
objects, comments, triple-quoted SQL, lists of objects, quoted dotted
keys) plus subset-boundary errors."""

import pytest

from pyspark_pipeline_framework_spark.plans.hocon import HoconError, load, loads


def test_reference_shaped_document():
    doc = '''
    # batch pipeline
    {
      name: "orders-daily"
      version: "1.0.0"
      mode: batch

      spark {
        app_name: "Orders"
        master: "local[*]"
        spark_conf {
          "spark.sql.shuffle.partitions": "10"
          "spark.sql.adaptive.enabled" = "true"
        }
      }

      components: [
        {
          name: "read_orders"
          component_type: source
          config {
            path: "/data/orders"
            filter_condition: "o_orderdate >= '2024-01-01'"
          }
        },
        {
          name: "daily"
          depends_on: ["read_orders"]
          config {
            sql: """
              SELECT date_trunc('day', o_orderdate) AS d, COUNT(*) AS n
              FROM orders GROUP BY 1
            """
          }
        }
      ]
    }
    '''
    d = loads(doc)
    assert d["name"] == "orders-daily" and d["mode"] == "batch"
    assert d["spark"]["spark_conf"]["spark.sql.shuffle.partitions"] == "10"
    assert len(d["components"]) == 2
    assert d["components"][1]["depends_on"] == ["read_orders"]
    assert "GROUP BY 1" in d["components"][1]["config"]["sql"]


def test_unbraced_root_equals_and_coercion():
    d = loads(
        """
        name = "p"          // line comment
        retries = 3
        ratio = 0.5
        enabled = true
        note = null
        tags = [a, b, 7]
        """
    )
    assert d == {
        "name": "p",
        "retries": 3,
        "ratio": 0.5,
        "enabled": True,
        "note": None,
        "tags": ["a", "b", 7],
    }


def test_dotted_keys_merge_and_later_scalar_wins():
    d = loads(
        """
        a.b.c: 1
        a.b.d: 2
        a { b { c: 9 } }
        """
    )
    assert d == {"a": {"b": {"c": 9, "d": 2}}}


def test_substitutions_full_value_and_optional():
    d = loads(
        """
        base: "/data"
        input: ${base}
        missing: ${?nope.nothere}
        nested { also: ${base} }
        """
    )
    assert d["input"] == "/data" and d["nested"]["also"] == "/data"
    # HOCON spec: a field whose value is a missing ${?optional} is
    # OMITTED (distinct from an explicit null)
    assert "missing" not in d
    with pytest.raises(HoconError, match="unresolved substitution"):
        loads("x: ${nope}")


def test_subset_boundaries_error_loudly():
    with pytest.raises(HoconError, match="url/classpath"):
        loads('include url("http://x/y.conf")\nname: x')
    with pytest.raises(HoconError, match="end of input"):
        loads("{ a: 1 ")


def test_concat_string_list_object():
    d = loads(
        """
        host: db.local
        port: 5432
        url: "jdbc://"${host}":"${port}"/main"
        path: ${base}/sub
        base: "/data"
        label: pre ${host} post
        xs: [1, 2] [3]
        more: ${xs} [4]
        obj: ${defaults} { b: 2 }
        defaults { a: 1, b: 0 }
        """
    )
    assert d["url"] == "jdbc://db.local:5432/main"
    assert d["path"] == "/data/sub"
    assert d["label"] == "pre db.local post"  # inter-token whitespace kept
    assert d["xs"] == [1, 2, 3]
    assert d["more"] == [1, 2, 3, 4]
    assert d["obj"] == {"a": 1, "b": 2}
    # missing optional substitution vanishes in string concat
    assert loads('v: "a"${?nope}"b"')["v"] == "ab"


def test_substituted_object_resolves_recursively():
    # a substitution whose target itself contains substitutions must not
    # leak unresolved nodes into the output
    d = loads("base { x: ${y} }\ny: 1\ncopy: ${base}")
    assert d["copy"] == {"x": 1} and d["base"] == {"x": 1}
    with pytest.raises(HoconError, match="cycle"):
        loads("a: ${b}\nb: ${a}")


def test_include_merges_and_guards(tmp_path):
    (tmp_path / "common.conf").write_text("defaults { retries: 3, mode: warn }\nowner: common\n")
    (tmp_path / "main.conf").write_text(
        'include "common.conf"\n'
        "owner: main\n"
        "job { retries: ${defaults.retries} }\n"
    )
    d = load(str(tmp_path / "main.conf"))
    assert d["defaults"] == {"retries": 3, "mode": "warn"}
    assert d["owner"] == "main"  # later keys override included ones
    assert d["job"]["retries"] == 3  # substitution sees included values
    # file() and required() wrappers
    (tmp_path / "w.conf").write_text('include required(file("common.conf"))\n')
    assert load(str(tmp_path / "w.conf"))["owner"] == "common"
    # missing non-required include merges nothing (HOCON semantics)
    (tmp_path / "m.conf").write_text('include "nope.conf"\nname: x\n')
    assert load(str(tmp_path / "m.conf")) == {"name": "x"}
    # missing required include raises
    (tmp_path / "r.conf").write_text('include required(file("nope.conf"))\n')
    with pytest.raises(HoconError, match="required include not found"):
        load(str(tmp_path / "r.conf"))
    # include cycles detected
    (tmp_path / "a.conf").write_text('include "b.conf"\n')
    (tmp_path / "b.conf").write_text('include "a.conf"\n')
    with pytest.raises(HoconError, match="include cycle"):
        load(str(tmp_path / "a.conf"))
    # 'include' as a plain key still works
    assert loads("include: 5") == {"include": 5}


def test_pipeline_config_from_conf_file(tmp_path):
    from pyspark_pipeline_framework_spark.plans.config import PipelineConfig

    p = tmp_path / "pipe.conf"
    p.write_text(
        """
        name: demo
        components: [
          { name: load, op: read, params { format: parquet, path: "/tmp/x" } },
          { name: agg, op: sql, depends_on: [load], params { sql: "SELECT 1 AS one" } }
        ]
        """
    )
    cfg = PipelineConfig.from_file(str(p))
    assert cfg.name == "demo"
    assert cfg.execution_order() == ["load", "agg"]
    assert cfg.get("load").params["format"] == "parquet"


# ------------------------------------------------------------- `+=` append

def test_append_to_existing_list():
    assert loads("xs = [1, 2]\nxs += 3") == {"xs": [1, 2, 3]}


def test_append_creates_missing_list():
    assert loads("xs += 1\nxs += 2") == {"xs": [1, 2]}


def test_append_across_merged_objects():
    # duplicate-key object merge must chain the self-reference
    text = """
    a { xs = [1] }
    a { xs += 2 }
    a { xs += 3 }
    """
    assert loads(text) == {"a": {"xs": [1, 2, 3]}}


def test_append_through_substitution_base():
    text = """
    defaults = [a, b]
    jobs = ${defaults}
    jobs += c
    """
    assert loads(text)["jobs"] == ["a", "b", "c"]


def test_append_element_may_be_substitution():
    text = """
    extra = cleanup
    steps = [build]
    steps += ${extra}
    """
    assert loads(text)["steps"] == ["build", "cleanup"]


def test_append_object_elements():
    text = """
    components += { name = one, op = sql }
    components += { name = two, op = sql }
    """
    out = loads(text)
    assert [c["name"] for c in out["components"]] == ["one", "two"]


def test_append_to_scalar_is_loud():
    with pytest.raises(HoconError, match="list target"):
        loads("x = 5\nx += 6")


def test_append_through_non_list_substitution_is_loud():
    # deferred `+=` over a substitution that resolves to a string must
    # raise the same loud error — never silently string-concatenate
    with pytest.raises(HoconError, match="list target"):
        loads('x = "scalar"\na = ${x}\na += y')


def test_append_through_missing_optional_substitution_starts_list():
    assert loads("a = ${?nope}\na += y")["a"] == ["y"]


def test_chained_append_through_substitution_base():
    text = """
    defaults = [a]
    jobs = ${defaults}
    jobs += b
    jobs += c
    """
    assert loads(text)["jobs"] == ["a", "b", "c"]


# ------------------------------------------------------- multi-line strings

def test_triple_quoted_multiline_preserved():
    text = 'sql = """\nSELECT *\nFROM t -- # not a comment\n"""'
    assert loads(text)["sql"] == "\nSELECT *\nFROM t -- # not a comment\n"


def test_triple_quoted_trailing_quote_quirk():
    # HOCON: extra closing quotes belong to the string
    assert loads('s = """x""""') == {"s": 'x"'}


def test_triple_quoted_no_escape_processing():
    assert loads(r's = """a\nb"""') == {"s": r"a\nb"}


# ------------------------------------------------------ conformance corpus
# Table-driven fixtures modeled on the public HOCON spec and pyhocon's
# test suite: self-referential substitution, ${?optional} edge cases,
# object-merge chains, multi-line strings. Unsupported constructs must
# raise a named HoconError, never silently misparse.

CONFORMANCE = [
    # --- self-referential substitution (previous value) ---
    ("path-append", 'path = "/usr"\npath = ${path}":/bin"', {"path": "/usr:/bin"}),
    ("self-list", "a = [1]\na = ${a} [2]", {"a": [1, 2]}),
    ("self-object", "a = {x: 1}\na = ${a} {y: 2}", {"a": {"x": 1, "y": 2}}),
    (
        "self-chain",
        'a = "x"\na = ${a}"y"\na = ${a}"z"',
        {"a": "xyz"},
    ),
    (
        "self-through-object-merge",
        "a { xs = [1] }\na { xs = ${a.xs} [2] }",
        {"a": {"xs": [1, 2]}},
    ),
    (
        "braced-root-self",
        '{ path = "/usr"\n  path = ${path}":/bin" }',
        {"path": "/usr:/bin"},
    ),
    (
        "self-dotted-key",
        "a.b = [1]\na.b = ${a.b} [2]",
        {"a": {"b": [1, 2]}},
    ),
    # --- ${?optional} edge cases ---
    ("optional-missing-omits-field", "a = ${?nope}", {}),
    ("optional-missing-nested", "a.b = ${?a.c}", {"a": {}}),
    ("optional-missing-list-element", "xs = [1, ${?m}, 2]", {"xs": [1, 2]}),
    (
        "optional-missing-in-concat",
        'url = "http://"${?host}"/"',
        {"url": "http:///"},
    ),
    ("optional-all-missing-concat", "a = ${?m1}${?m2}", {}),
    (
        "optional-override-keeps-previous",
        "port = 8080\nport = ${?NO_SUCH_ENV_VAR_XYZ}",
        {"port": 8080},
    ),
    (
        "optional-override-nested-keeps-previous",
        "server { port = 8080\n  port = ${?NO_SUCH_ENV_VAR_XYZ} }",
        {"server": {"port": 8080}},
    ),
    (
        "optional-present-overrides",
        "port = 8080\nhi = 9090\nport = ${?hi}",
        {"port": 9090, "hi": 9090},
    ),
    ("null-is-not-missing", "a = null\nb = ${?a}", {"a": None, "b": None}),
    # --- object merge / extension chains ---
    (
        "extends-chain",
        "base = {timeout: 10}\ns1 = ${base} {a: 1}\ns2 = ${s1} {b: 2}",
        {
            "base": {"timeout": 10},
            "s1": {"timeout": 10, "a": 1},
            "s2": {"timeout": 10, "a": 1, "b": 2},
        },
    ),
    (
        "merge-later-scalar-wins",
        "a { x = 1\n  y = 2 }\na { x = 9 }",
        {"a": {"x": 9, "y": 2}},
    ),
    # --- multi-line strings ---
    (
        "triple-no-substitution",
        's = """${not_a_subst}"""',
        {"s": "${not_a_subst}"},
    ),
    (
        "triple-embedded-quotes",
        's = """say "hi" twice"""',
        {"s": 'say "hi" twice'},
    ),
    (
        "null-renders-in-concat",
        "n = null\ns = \"v=\"${n}",
        {"n": None, "s": "v=null"},
    ),
]


@pytest.mark.parametrize("name,text,expected", CONFORMANCE, ids=[c[0] for c in CONFORMANCE])
def test_hocon_conformance(name, text, expected):
    assert loads(text) == expected


def test_env_fallback_substitution(monkeypatch):
    monkeypatch.setenv("PPFS_CONF_TEST_VAR", "from-env")
    assert loads("v = ${PPFS_CONF_TEST_VAR}") == {"v": "from-env"}
    assert loads("v = ${?PPFS_CONF_TEST_VAR}") == {"v": "from-env"}
    monkeypatch.delenv("PPFS_CONF_TEST_VAR")
    with pytest.raises(HoconError, match="unresolved substitution"):
        loads("v = ${PPFS_CONF_TEST_VAR}")
    assert loads("v = ${?PPFS_CONF_TEST_VAR}") == {}


def test_env_override_idiom(monkeypatch):
    monkeypatch.setenv("PPFS_CONF_PORT", "9999")
    assert loads("port = 8080\nport = ${?PPFS_CONF_PORT}") == {"port": "9999"}


CONFORMANCE_ERRORS = [
    ("self-no-previous", "x = ${x}", "unresolved|cycle"),
    ("mutual-cycle", "a = ${b}\nb = ${a}", "cycle"),
    (
        "nested-self-ref-out-of-subset",
        "x { b = ${x.b} [1] }",
        "cycle",
    ),
    ("append-to-object", "a = {x: 1}\na += 2", "list target"),
    (
        "concat-object-with-string",
        'a = {x: 1}\nb = "s"${a}',
        "string-concatenate",
    ),
]


@pytest.mark.parametrize(
    "name,text,pattern", CONFORMANCE_ERRORS, ids=[c[0] for c in CONFORMANCE_ERRORS]
)
def test_hocon_conformance_errors(name, text, pattern):
    with pytest.raises(HoconError, match=pattern):
        loads(text)


def test_explicit_null_is_a_previous_value():
    # spec previous-value semantics: explicit null != absent
    assert loads('a = null\na = ${a} "x"') == {"a": "null x"}
    assert loads("a = null\na = ${?missing_key_xyz}") == {"a": None}
    assert loads("a = null\na = ${?missing_key_xyz}\nb = 1") == {
        "a": None,
        "b": 1,
    }


def test_append_after_optional_env_override(monkeypatch):
    # the env-override idiom followed by +=: `a = [1]; a = ${?ENV}; a += 2`
    monkeypatch.delenv("PPFS_CONF_LIST", raising=False)
    assert loads("a = [1]\na = ${?PPFS_CONF_LIST}\na += 2") == {"a": [1, 2]}


def test_append_to_null_is_loud_without_internal_names():
    with pytest.raises(HoconError, match="list target, found null"):
        loads("a = null\na += 2")
    # internal node-class names must never leak into messages
    for text in ("a = null\na += 2", "a = {x: 1}\na += 2"):
        try:
            loads(text)
        except HoconError as e:
            assert "_Fallback" not in str(e) and "_Subst" not in str(e)


# ---------------------------------------------------------------------------
# Generative JSON-superset conformance: every JSON document is valid
# HOCON and must parse to the identical structure (spec: "HOCON is a
# superset of JSON"). json.dumps(ensure_ascii=True) routes every
# non-ASCII char and control char through \uXXXX escapes, so this also
# pins the full JSON string-escape surface incl. surrogate pairs.
# ---------------------------------------------------------------------------
import json as _json

from hypothesis import given, settings
from hypothesis import strategies as st

_scalars = (
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20)
)
_json_vals = st.recursive(
    _scalars,
    lambda kids: st.lists(kids, max_size=4)
    | st.dictionaries(st.text(min_size=1, max_size=10), kids, max_size=4),
    max_leaves=20,
)


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=10), _json_vals, max_size=5))
def test_hocon_parses_any_json_document(doc):
    assert loads(_json.dumps(doc)) == doc


def test_unicode_escapes_and_surrogate_pairs():
    # \uXXXX escape and raw unicode must agree
    assert loads('a = "\\u00e9\\u4e2d"') == {"a": "\u00e9\u4e2d"}
    assert loads('a = "\u00e9\u4e2d"') == {"a": "\u00e9\u4e2d"}
    # astral char as a JSON surrogate pair (how json.dumps emits it)
    assert loads('a = "\\ud83d\\ude00"') == {"a": "\U0001f600"}
    assert loads('a = "\\b\\f"') == {"a": "\b\f"}
    with pytest.raises(HoconError, match="u escape"):
        loads('a = "\\uZZZZ"')


def test_env_fallback_string_typing_caught_downstream(monkeypatch):
    """Documented HOCON caveat (module docstring + README): env-fallback
    values are raw strings while file values are coerced. The typed
    config layer must catch the resulting string-typed int field loudly
    instead of accepting it."""
    import pytest as _pytest

    from pyspark_pipeline_framework_spark.observability.config import (
        HooksConfigError,
        MetricsHooksConfig,
    )

    monkeypatch.setenv("METRICS_INTERVAL", "9999")
    cfg = loads(
        "metrics { backend = in_memory\n"
        "  export_interval_seconds = ${METRICS_INTERVAL} }"
    )
    # env fallback: string, NOT coerced (file-written values would be int)
    assert cfg["metrics"]["export_interval_seconds"] == "9999"
    assert loads("x = 9999")["x"] == 9999
    with _pytest.raises(HooksConfigError, match="export_interval_seconds"):
        MetricsHooksConfig.from_dict(cfg["metrics"])
