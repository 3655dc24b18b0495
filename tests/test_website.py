"""End-to-end test for the static website generator."""

import os

from kmb_tpu.definitions import Definition
from kmb_tpu.runner import run

import create_website


def _run_tiny(dataset):
    definition = Definition(
        algorithm="bruteforce-product-blas",
        module="kmb_tpu.algorithms.bruteforce_numpy",
        constructor="BruteForceProductBLAS",
        arguments={"kernel": "inverse-distance", "dimension": 3,
                   "precision": "float32"},
        query_argument_groups=[{}],
    )
    run(definition=definition, dataset=dataset, runs=1)


def test_build_website(tmp_path, monkeypatch):
    monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
    dataset = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
    _run_tiny(dataset)

    outdir = str(tmp_path / "website")
    create_website.main(["--outputdir", outdir, "--latex"])

    index = open(os.path.join(outdir, "index.html")).read()
    assert dataset in index
    assert "bruteforce-product-blas" in index

    detail = open(os.path.join(outdir, f"{dataset}.html")).read()
    assert "new Chart" in detail
    assert "tikzpicture" in detail          # --latex export present
    assert "RMSE error" in detail
    # Static summary render embedded next to the interactive plots
    # (reference create_website.py:240-256) and present on disk.
    assert f"{dataset}_summary.png" in detail
    assert os.path.exists(os.path.join(outdir, f"{dataset}_summary.png"))
    assert f"{dataset}_summary.png" in index  # index-page thumbnail

    algo_page = open(
        os.path.join(outdir, "bruteforce-product-blas.html")).read()
    assert "new Chart" in algo_page


def test_scatter_mode(tmp_path, monkeypatch):
    monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
    dataset = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
    _run_tiny(dataset)
    outdir = str(tmp_path / "website")
    create_website.main(["--outputdir", outdir, "--scatter"])
    detail = open(os.path.join(outdir, f"{dataset}.html")).read()
    assert "showLine: false" in detail


def test_report_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
    dataset = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
    _run_tiny(dataset)

    import report
    rows = report.collect("product-sphere-*")
    assert len(rows) == 1
    assert rows[0]["algorithm"] == "bruteforce-product-blas"
    assert rows[0]["rmse"] >= 0.0
    report.emit(rows, "markdown")
    out = capsys.readouterr().out
    assert dataset in out and "| RMSE |" in out
    report.emit(rows, "tsv")
    out = capsys.readouterr().out
    assert out.startswith("dataset\t")
