"""CLI + search-driver smoke tests."""
import io
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERRIDES = [
    "training.num_epochs", "1",
    "monitoring.search_every_epochs", "0",
    "monitoring.validate_every_epochs", "0",
    "net.dim_dec", "8",
    "net.dims_bidir", "[6]",
    "net.dim_matcher", "8",
    "net.post_merge_dims", "[8]",
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from make_toy_dataset import make_toy_dataset
    make_toy_dataset(str(d / "toy.h5"), num_examples=20, num_chars=4,
                     feat_dim=5, max_len=4, seed=5)
    cfg = open(os.path.join(ROOT, "tests", "configs", "toy.yaml")).read()
    cfg = cfg.replace("/tmp/toy.h5", str(d / "toy.h5"))
    (d / "toy.yaml").write_text(cfg)
    return d


@pytest.mark.slow
def test_cli_train_subprocess(setup):
    d = setup
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + ":" + ROOT + "/tools")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bin", "run.py"), "train",
         str(d / "model.zip"), str(d / "toy.yaml"), "--fast-start"]
        + OVERRIDES,
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(d / "model.zip")


@pytest.mark.slow
def test_search_driver_in_process(setup, tmp_path):
    d = setup
    from attention_lvcsr_tpu.cli.run import build_parser, prepare_config
    from attention_lvcsr_tpu.train import driver
    args = build_parser().parse_args(
        ["search", str(d / "toy.yaml")] + OVERRIDES)
    config = prepare_config(args)
    report_dir = str(tmp_path / "report")
    out = io.StringIO()
    stats = driver.search(config, str(d / "model.zip"), part="valid",
                          report=None, decoded_save=str(tmp_path / "dec"),
                          print_to=out)
    assert stats["num_examples"] > 0
    assert os.path.exists(tmp_path / "dec")
    text = open(tmp_path / "dec").read()
    assert text.strip() != ""


def test_init_norm_in_process(setup, tmp_path):
    d = setup
    from attention_lvcsr_tpu.cli.run import build_parser, prepare_config
    from attention_lvcsr_tpu.train import driver
    args = build_parser().parse_args(["init_norm", "x", str(d / "toy.yaml")])
    config = prepare_config(args)
    path = str(tmp_path / "norm.npz")
    norm = driver.init_norm(config, path)
    assert os.path.exists(path)
    assert norm.mean.shape == (5,)


@pytest.mark.slow
def test_sample_driver_in_process(setup, capsys):
    d = setup
    from attention_lvcsr_tpu.cli.run import build_parser, prepare_config
    from attention_lvcsr_tpu.train import driver
    args = build_parser().parse_args(
        ["sample", str(d / "toy.yaml")] + OVERRIDES)
    config = prepare_config(args)
    import io
    out = io.StringIO()
    driver.sample(config, str(d / "model.zip"), part="valid", print_to=out)
    text = out.getvalue()
    assert "Groundtruth:" in text and "Recognized:" in text


def test_show_data_in_process(setup):
    d = setup
    from attention_lvcsr_tpu.cli.run import build_parser, prepare_config
    from attention_lvcsr_tpu.train import driver
    args = build_parser().parse_args(["show_data", str(d / "toy.yaml")])
    batch = driver.show_data(prepare_config(args))
    assert "recordings" in batch and "labels_mask" in batch


@pytest.mark.slow
def test_search_driver_batched_decode(setup, tmp_path):
    """monitoring.search.decode_batch chunks the eval decode into
    batched on-device searches; per-utterance CER stays in the same
    ballpark as the one-by-one path (decode caps differ slightly, so
    exact equality is not guaranteed)."""
    d = setup
    from attention_lvcsr_tpu.cli.run import build_parser, prepare_config
    from attention_lvcsr_tpu.train import driver
    args = build_parser().parse_args(
        ["search", str(d / "toy.yaml")] + OVERRIDES
        + ["monitoring.search.decode_batch", "4"])
    config = prepare_config(args)
    out = io.StringIO()
    stats = driver.search(config, str(d / "model.zip"), part="valid",
                          report=None,
                          decoded_save=str(tmp_path / "dec_b"),
                          print_to=out)
    assert stats["num_examples"] > 0
    assert os.path.exists(tmp_path / "dec_b")
    assert open(tmp_path / "dec_b").read().strip() != ""
