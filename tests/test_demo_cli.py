"""Demo CLI regression: the reference's demo.ipynb flow end-to-end."""

from __future__ import annotations

from ecommerce_full_etl_process_spark import demo


def test_demo_corpus_report_passes(spark, sf_dir):
    rc = demo.main(["--corpus", sf_dir])
    assert rc == 0


def test_demo_main_passes(spark, tmp_path):
    rc = demo.main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--users", "50",
            "--products", "15",
            "--transactions", "120",
            "--invalid", "20",
            "--seed", "3",
        ]
    )
    assert rc == 0

def test_demo_stream_dedup_passes(spark, tmp_path):
    rc = demo.main(["--stream-dedup", str(tmp_path / "sd")])
    assert rc == 0


def test_demo_cdc_report_passes(spark, tmp_path):
    rc = demo.main(["--cdc", str(tmp_path / "cdc")])
    assert rc == 0
