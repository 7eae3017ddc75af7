"""Config surface: TOML overlay, CLI patch, cross-section propagation,
derived interval (toml.go semantics), and F3 static plan gating."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.config import AggregatorConfig
from dnstap2clickhouse_spark.toml_config import load_config
from dnstap2clickhouse_spark.operators.dns_pipeline import build_pipeline

SF = "/root/testdata/sf0.001"

TOML = """
[aggregator]
aggregate = true
write_interval = 40
groupby_question = false

[dnstap]
client_queries = true
non_ok_client_responses = false
client_response_time_samples = true

[clickhouse]
query_columns = { queryTime = "ts", identity = "", queryAddress = "addr", questionName = "qn", questionType = "qt", counter = "hits" }
"""

def _write(text: str) -> str:
    f = tempfile.NamedTemporaryFile("w", suffix=".toml", delete=False)
    f.write(text)
    f.close()
    return f.name

def test_defaults_match_reference():
    cfg = load_config()
    assert cfg.aggregator.write_interval_s == 20  # toml.go:46
    assert cfg.aggregator.response_time_interval_s == 10  # toml.go:189-191
    assert cfg.aggregator.groupby_question and cfg.aggregator.write_ungrouped

def test_toml_overlay_and_derivation():
    cfg = load_config(_write(TOML))
    assert cfg.aggregator.write_interval_s == 40
    assert cfg.aggregator.response_time_interval_s == 20  # derived w/2
    assert cfg.aggregator.groupby_question is False
    # cross-section propagation (toml.go:181-187)
    assert cfg.aggregator.non_ok_client_responses is False
    assert cfg.aggregator.client_response_time_samples is True
    # column config with empty-name pruning payload intact
    assert cfg.sink.query_columns["identity"] == ""

def test_cli_overrides_win():
    cfg = load_config(_write(TOML), cli_overrides={"write_interval": 60})
    assert cfg.aggregator.write_interval_s == 60
    assert cfg.aggregator.response_time_interval_s == 30

def test_unknown_keys_ignored():
    cfg = load_config(_write("[aggregator]\nbogus_key = 1\n"))
    assert cfg.aggregator.write_interval_s == 20

def test_f3_static_plan_gating(spark):
    cfg = AggregatorConfig(non_ok_client_responses=False)
    out = build_pipeline(spark, SF, cfg)
    assert set(out) == {"clientQuery", "clientQueryResponseTime"}
    cfg_all = AggregatorConfig()
    assert set(build_pipeline(spark, SF, cfg_all)) == {
        "clientQuery",
        "clientResponse",
        "clientQueryResponseTime",
    }
