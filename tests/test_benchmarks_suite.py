"""Smoke tests for the ``benchmarks/`` suite (the TPU analogue of the
reference's inherited diffusers benchmark harness,
``stylization/BrushNet/benchmarks/*.py``).

Each workload runs at ``--preset tiny`` on the CPU mesh and must append
well-formed rows to the collated CSV.
"""
import csv
import importlib.util
import os
import sys

import pytest

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(BENCH_DIR, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, BENCH_DIR)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(BENCH_DIR)
    return mod


def _args(csv_path, **over):
    import argparse

    utils = _load("utils")
    p = argparse.ArgumentParser()
    utils.add_common_args(p)
    base = ["--preset", "tiny", "--num_inference_steps", "2",
            "--n_iter", "1", "--csv", str(csv_path)]
    ns, _ = p.parse_known_args(base)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def _check_csv(path, expect_rows):
    utils = _load("utils")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == expect_rows
    for r in rows:
        assert set(r) == set(utils.BENCHMARK_FIELDS)
        assert float(r["time (secs)"]) > 0
        assert float(r["images_per_s"]) > 0
    return rows


@pytest.mark.slow
def test_text_to_image_tiny(tmp_path):
    mod = _load("benchmark_text_to_image")
    args = _args(tmp_path / "t2i.csv", models=["sdxl", "z_image", "flux"])
    rows = mod.run(args)
    assert [r["pipeline_cls"] for r in rows] == [
        "SDXL-t2i", "ZImage-t2i", "FLUX1-t2i"]
    _check_csv(tmp_path / "t2i.csv", 3)


@pytest.mark.slow
def test_inpainting_tiny(tmp_path):
    mod = _load("benchmark_inpainting")
    args = _args(tmp_path / "inp.csv", models=["sdxl", "sd15"])
    rows = mod.run(args)
    assert [r["pipeline_cls"] for r in rows] == [
        "SDXL-BrushNet-inpaint", "SD15-BrushNet-inpaint"]
    _check_csv(tmp_path / "inp.csv", 2)


@pytest.mark.slow
def test_lcm_tiny(tmp_path):
    mod = _load("benchmark_t2i_lcm_lora")
    rows = mod.run(_args(tmp_path / "lcm.csv"))
    assert rows[0]["pipeline_cls"] == "SDXL-LCM"
    _check_csv(tmp_path / "lcm.csv", 1)


@pytest.mark.slow
def test_controlnet_tiny(tmp_path):
    mod = _load("benchmark_controlnet")
    rows = mod.run(_args(tmp_path / "cn.csv"))
    assert rows[0]["pipeline_cls"] == "QwenImage-ControlNet"
    assert rows[0]["quantize"] == "none"  # tiny preset never quantizes
    _check_csv(tmp_path / "cn.csv", 1)


@pytest.mark.slow
def test_ip_adapters_tiny(tmp_path):
    mod = _load("benchmark_ip_adapters")
    rows = mod.run(_args(tmp_path / "ip.csv"))
    assert rows[0]["pipeline_cls"] == "FLUX1-IPAdapter"
    _check_csv(tmp_path / "ip.csv", 1)


def test_push_results_collates_and_annotates(tmp_path):
    """push_results: keyed merge + percent-change annotation + markdown."""
    pr = _load("push_results")
    cur = tmp_path / "collated_results.csv"
    header = ("pipeline_cls,config,batch_size,num_inference_steps,quantize,"
              "time (secs),images_per_s,memory (gbs),backend,git_sha\n")
    cur.write_text(
        header
        + "SDXL-t2i,1024px-cfg,1,50,none,5.0000,0.2000,4.800,tpu,abc\n"
        + "NEW-t2i,1024px,1,50,none,2.0000,0.5000,1.000,tpu,abc\n")
    prev = tmp_path / "prev.csv"
    # previous run: reordered rows, one annotated value, one extra field order
    prev.write_text(
        header
        + "OTHER,x,1,50,none,9.0,0.1,2.0,tpu,old\n"
        + "SDXL-t2i,1024px-cfg,1,50,none,4.0000 (+1.00%),0.2500,4.800,tpu,old\n")
    extra = tmp_path / "extra_run.csv"
    extra.write_text(
        header + "SDXL-t2i,1024px-cfg,2,50,none,8.0000,0.2500,4.900,tpu,abc\n")

    rows = pr.annotate(pr.collate([str(cur), str(extra)]),
                       pr.read_rows(str(prev)))
    by_key = {(r["pipeline_cls"], r["batch_size"]): r for r in rows}
    # matched row: +25% vs previous 4.0 (annotation on prev stripped)
    assert by_key[("SDXL-t2i", "1")]["time (secs)"] == "5.0 (+25.00%)"
    # new rows pass through unannotated
    assert by_key[("NEW-t2i", "1")]["time (secs)"] == "2.0000"
    assert by_key[("SDXL-t2i", "2")]["time (secs)"] == "8.0000"

    md = pr.write_markdown(rows, str(tmp_path / "BENCHMARKS.md"))
    text = open(md).read()
    assert "| SDXL-t2i |" in text and "(+25.00%)" in text


@pytest.mark.slow
def test_img2img_tiny(tmp_path):
    mod = _load("benchmark_img2img")
    args = _args(tmp_path / "i2i.csv", strength=0.75)
    rows = mod.run(args)
    assert rows[0]["pipeline_cls"] == "SDXL-img2img"
    assert rows[0]["num_inference_steps"] == "1"  # ceil? 2 steps * 0.75 -> 1
    _check_csv(tmp_path / "i2i.csv", 1)


@pytest.mark.slow
def test_serving_tiny(tmp_path):
    mod = _load("benchmark_serving")
    rows = mod.run(_args(tmp_path / "serve.csv"))
    assert [r["pipeline_cls"] for r in rows] == [
        "WanServing-fifo", "WanServing-fifo-makespan",
        "WanServing-continuous", "WanServing-continuous-makespan"]
    _check_csv(tmp_path / "serve.csv", 4)
