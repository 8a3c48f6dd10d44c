"""Story orchestrator wiring (examples/fairygen_story.py)."""
import os
import subprocess
import sys


def test_help_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "fairygen_story.py"),
         "--help"], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    for stage in ("mask", "style", "stylize", "animate"):
        assert stage in out.stdout


def test_stage_motion_prompts(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from examples.fairygen_story import stage_motion_prompts

    shots = tmp_path / "shots"
    motion = tmp_path / "motion"
    prompts = tmp_path / "prompts"
    for d in (shots, motion, prompts):
        d.mkdir()
    (shots / "01.png").write_bytes(b"x")
    (shots / "02.png").write_bytes(b"x")
    (shots / "03.png").write_bytes(b"x")
    (motion / "01.txt").write_text("the pig runs")
    (prompts / "02.txt").write_text("a meadow")
    (shots / "03.txt").write_text("already staged")
    n = stage_motion_prompts(str(shots), str(motion), str(prompts))
    assert n == 3
    assert (shots / "01.txt").read_text() == "the pig runs"  # motion wins
    assert (shots / "02.txt").read_text() == "a meadow"      # fallback
    assert (shots / "03.txt").read_text() == "already staged"
