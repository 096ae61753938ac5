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
    assert d["missing"] is None
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
