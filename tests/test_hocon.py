"""HOCON-subset parser tests — the grammar the reference's example
configs actually exercise (braced/unbraced roots, ``:``/``=``/implicit
objects, comments, triple-quoted SQL, lists of objects, quoted dotted
keys) plus subset-boundary errors."""

import pytest

from pyspark_pipeline_framework_spark.plans.hocon import HoconError, loads


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
    with pytest.raises(HoconError, match="include"):
        loads('include "other.conf"\nname: x')
    with pytest.raises(HoconError, match="concatenation"):
        loads('base: "/d"\npath: ${base} "/sub"')
    with pytest.raises(HoconError, match="end of input"):
        loads("{ a: 1 ")


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
