"""CLI smoke tests: every training entry point runs end-to-end (tiny shapes,
CPU) — the pipeline-level regression net the reference only had as shell
scripts."""

import os

import pytest


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


def test_classifier_then_samplenet_then_eval(tdir):
    from samplenet_tpu.train import train_classifier, train_samplenet
    from samplenet_tpu.train import evaluate_cli

    train_classifier.main([
        "--epochs", "1", "--steps-per-epoch", "2", "--train-size", "16",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--log-dir", f"{tdir}/cls"])
    train_samplenet.main([
        "--epochs", "1", "--steps-per-epoch", "2", "--train-size", "16",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--num-out-points", "8", "--bottleneck-size", "32",
        "--group-size", "4", "--classifier-ckpt", f"{tdir}/cls/ckpt",
        "--log-dir", f"{tdir}/sn"])
    report = evaluate_cli.main([
        "samplenet", "--ckpt", f"{tdir}/sn/ckpt",
        "--classifier-ckpt", f"{tdir}/cls/ckpt",
        "--num-out-points", "8", "--bottleneck-size", "32",
        "--group-size", "4", "--num-points", "64", "--batch-size", "4",
        "--test-size", "8", "--log-dir", f"{tdir}/eval"])
    assert 0.0 <= report["accuracy"] <= 1.0
    assert os.path.isdir(f"{tdir}/sn/snap_last")


def _write_synthetic_modelnet(root_dir, *, train_clouds=12, test_clouds=8):
    """Official-schema modelnet40_ply_hdf5_2048 tree, synthetic bytes."""
    import numpy as np
    from samplenet_tpu.data.modelnet import save_h5

    root = os.path.join(root_dir, "modelnet40_ply_hdf5_2048")
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in (("train", train_clouds), ("test", test_clouds)):
        name = f"ply_data_{split}0.h5"
        save_h5(os.path.join(root, name),
                rng.randn(n, 2048, 3).astype(np.float32),
                rng.randint(0, 40, n).astype(np.uint8))
        with open(os.path.join(root, f"{split}_files.txt"), "w") as f:
            f.write(f"data/modelnet40_ply_hdf5_2048/{name}\n")
    return root


def test_modelnet40_ingest_dry_run(tdir):
    """VERDICT item 10: the acc@32-parity pipeline is one command away —
    validate a synthetic drop in the official schema, then run the
    classifier CLI against it end-to-end."""
    pytest.importorskip("h5py")
    import json

    from samplenet_tpu.data import ingest
    from samplenet_tpu.train import train_classifier

    _write_synthetic_modelnet(tdir)
    manifest = ingest.main(["modelnet40", "--data-dir", tdir])
    assert manifest["splits"] == {"train": 12, "test": 8}
    assert not manifest["official_counts"]  # synthetic, flagged honestly
    with pytest.raises(ValueError):
        ingest.validate_modelnet40(tdir, strict=True)
    # manifest written next to the data with per-file checksums
    mpath = os.path.join(tdir, "modelnet40_ply_hdf5_2048",
                         ingest.MANIFEST)
    assert len(json.load(open(mpath))["files"]) == 2

    train_classifier.main([
        "--dataset", "modelnet40", "--data-dir", tdir,
        "--epochs", "1", "--steps-per-epoch", "2", "--num-points", "64",
        "--batch-size", "4", "--log-dir", f"{tdir}/cls40"])
    assert os.path.exists(f"{tdir}/cls40/ckpt")


def test_shapenet_ingest_per_file_validation(tdir):
    """Every PLY is checksummed and header-counted; a truncated file fails
    validation instead of passing on a per-class sample."""
    import numpy as np

    from samplenet_tpu.data import ingest
    from samplenet_tpu.data.plyio import save_ply
    from samplenet_tpu.data.shapenet import CATEGORY_TO_SYNSET

    rng = np.random.RandomState(0)
    syn = CATEGORY_TO_SYNSET["chair"]
    d = os.path.join(tdir, syn)
    os.makedirs(d)
    for i in range(3):
        save_ply(os.path.join(d, f"m{i}.ply"),
                 rng.randn(128, 3).astype(np.float32))
    manifest = ingest.main(["shapenet", "--data-dir", tdir])
    assert manifest["classes"]["chair"]["files"] == 3
    assert manifest["classes"]["chair"]["uniform_points"]
    assert len(manifest["files"]) == 3
    for rec in manifest["files"].values():
        assert rec["points"] == 128 and len(rec["md5"]) == 32
    # truncate one file's header -> validation must raise, not pass
    victim = os.path.join(d, "m1.ply")
    with open(victim, "r+b") as f:
        f.truncate(10)
    with pytest.raises(ValueError):
        ingest.validate_shapenet(tdir)


def test_samplenet_resume(tdir):
    from samplenet_tpu.train import train_classifier, train_samplenet

    train_classifier.main([
        "--epochs", "1", "--steps-per-epoch", "1", "--train-size", "8",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--log-dir", f"{tdir}/cls"])
    args = ["--steps-per-epoch", "1", "--train-size", "8",
            "--test-size", "8", "--num-points", "64", "--batch-size", "4",
            "--num-out-points", "8", "--bottleneck-size", "32",
            "--group-size", "4", "--classifier-ckpt", f"{tdir}/cls/ckpt",
            "--log-dir", f"{tdir}/sn"]
    train_samplenet.main(["--epochs", "1"] + args)
    state = train_samplenet.main(["--epochs", "2", "--resume"] + args)
    assert int(state.step) == 2  # one step epoch 0 + one step epoch 1


def test_registration_both_phases(tdir):
    from samplenet_tpu.train import train_registration

    train_registration.main([
        "--phase", "pcrnet", "--epochs", "1", "--steps-per-epoch", "1",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--num-out-points", "8",
        "--log-dir", f"{tdir}/pcr"])
    train_registration.main([
        "--phase", "samplenet", "--epochs", "1", "--steps-per-epoch", "1",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--num-out-points", "8", "--group-size", "4",
        "--pcrnet-ckpt", f"{tdir}/pcr/ckpt", "--log-dir", f"{tdir}/regsn"])


def test_reconstruction_both_phases(tdir):
    from samplenet_tpu.train import train_reconstruction

    train_reconstruction.main([
        "--phase", "ae", "--epochs", "1", "--steps-per-epoch", "1",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--bottleneck-size", "32",
        "--log-dir", f"{tdir}/ae"])
    train_reconstruction.main([
        "--phase", "samplenet", "--epochs", "1", "--steps-per-epoch", "1",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--num-out-points", "8", "--group-size", "4",
        "--ae-ckpt", f"{tdir}/ae/ckpt", "--log-dir", f"{tdir}/aesn"])
    # standalone eval of existing checkpoints (the reference's
    # autoencoder/evaluate_ae.py + sampler/evaluate_samplenet.py flows)
    train_reconstruction.main([
        "--phase", "ae", "--epochs", "0", "--init-ckpt", f"{tdir}/ae/ckpt",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--bottleneck-size", "32",
        "--log-dir", f"{tdir}/ae_eval"])
    assert "eval-only" in open(f"{tdir}/ae_eval/log_ae.txt").read()
    train_reconstruction.main([
        "--phase", "samplenet", "--epochs", "0",
        "--init-ckpt", f"{tdir}/aesn/ckpt",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--num-out-points", "8", "--group-size", "4",
        "--ae-ckpt", f"{tdir}/ae/ckpt", "--log-dir", f"{tdir}/aesn_eval"])
    assert "eval-only" in open(f"{tdir}/aesn_eval/log_samplenet.txt").read()


def test_reconstruction_shapenet_dataset(tdir):
    """--dataset shapenet: official-schema PLY tree (synset dir, binary
    PLYs) through the 85/5/10 split, parallel parse (native C++ parser
    when built), AE train, and the sampler NRE eval."""
    import numpy as np
    from samplenet_tpu.data.plyio import save_ply
    from samplenet_tpu.train import train_reconstruction

    synset_dir = os.path.join(
        tdir, "shape_net_core_uniform_samples_2048", "03001627")
    os.makedirs(synset_dir)
    rng = np.random.RandomState(0)
    for i in range(40):  # 85/5/10 -> 34 train / 2 val / 4 test
        save_ply(os.path.join(synset_dir, f"{i:032x}.ply"),
                 rng.randn(128, 3).astype(np.float32))
    common = ["--dataset", "shapenet", "--data-dir", tdir,
              "--category", "chair", "--num-points", "64",
              "--batch-size", "4", "--epochs", "1",
              "--steps-per-epoch", "1"]
    train_reconstruction.main(
        ["--phase", "ae", "--bottleneck-size", "32",
         "--log-dir", f"{tdir}/ae"] + common)
    assert "34 train / 2 val / 4 test" in open(f"{tdir}/ae/log_ae.txt").read()
    train_reconstruction.main(
        ["--phase", "samplenet", "--num-out-points", "8",
         "--group-size", "4", "--ae-ckpt", f"{tdir}/ae/ckpt",
         "--fps-baseline", "--log-dir", f"{tdir}/aesn"] + common)
    log = open(f"{tdir}/aesn/log_samplenet.txt").read()
    assert "NRE" in log and "FPS baseline @8" in log


def test_registration_h5_dir(tdir):
    """--h5-dir: the single-class h5 pair (make_car_dataset.py output
    schema) drives both registration phases in place of procedural data."""
    import numpy as np
    from samplenet_tpu.data.modelnet import save_h5
    from samplenet_tpu.train import train_registration

    rng = np.random.RandomState(0)
    for split, n in (("train", 8), ("test", 4)):
        save_h5(os.path.join(tdir, f"car_{split}.h5"),
                rng.randn(n, 128, 3).astype(np.float32),
                np.full(n, 7, np.uint8))
    common = ["--h5-dir", tdir, "--num-points", "64", "--batch-size", "4",
              "--epochs", "1", "--steps-per-epoch", "1"]
    train_registration.main(
        ["--phase", "pcrnet", "--num-out-points", "8",
         "--log-dir", f"{tdir}/pcr"] + common)
    train_registration.main(
        ["--phase", "samplenet", "--num-out-points", "8",
         "--group-size", "4", "--pcrnet-ckpt", f"{tdir}/pcr/ckpt",
         "--log-dir", f"{tdir}/regsn"] + common)
    assert os.path.isdir(f"{tdir}/regsn/ckpt")


def test_progressive_cli(tdir):
    from samplenet_tpu.train import train_classifier, train_progressive

    train_classifier.main([
        "--epochs", "1", "--steps-per-epoch", "1", "--train-size", "8",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--log-dir", f"{tdir}/cls"])
    train_progressive.main([
        "--epochs", "2", "--eval-every", "1", "--steps-per-epoch", "1",
        "--train-size", "8",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--max-num-out-points", "16", "--min-num-out-points", "8",
        "--bottleneck-size", "32", "--group-size", "4",
        "--classifier-ckpt", f"{tdir}/cls/ckpt",
        "--log-dir", f"{tdir}/prog"])
    # the mid-run eval leaves a loadable checkpoint and eval metrics rows
    metrics = open(f"{tdir}/prog/metrics_progressive.jsonl").read()
    assert metrics.count('"eval_acc@8"') == 2  # epoch-1 eval + final


def test_reconstruction_progressive(tdir):
    from samplenet_tpu.train import train_reconstruction

    train_reconstruction.main([
        "--phase", "ae", "--epochs", "1", "--steps-per-epoch", "1",
        "--train-size", "8", "--test-size", "8", "--batch-size", "4",
        "--num-points", "64", "--bottleneck-size", "32",
        "--log-dir", f"{tdir}/ae"])
    train_reconstruction.main([
        "--phase", "samplenet", "--progressive", "--epochs", "1",
        "--steps-per-epoch", "1", "--train-size", "8", "--test-size", "8",
        "--batch-size", "4", "--num-points", "64",
        "--num-out-points", "16", "--min-num-out-points", "8",
        "--group-size", "4", "--ae-ckpt", f"{tdir}/ae/ckpt",
        "--log-dir", f"{tdir}/aesnp"])
    # progressive quality evidence: the prefix-NRE curve is produced from
    # the single ordered checkpoint with one entry per nested size
    import json

    curve = json.load(open(f"{tdir}/aesnp/prefix_nre.json"))
    assert sorted(curve) == ["16", "8"]
    for rec in curve.values():
        assert rec["nre"] > 0 and rec["loss_full"] > 0


def test_eval_cli_classifier_infer_fromfiles(tdir):
    """The remaining evaluate_cli modes: voting eval, infer dumps, and
    prefix evaluation from the dumped files."""
    from samplenet_tpu.train import (
        evaluate_cli,
        train_classifier,
        train_progressive,
    )

    train_classifier.main([
        "--epochs", "1", "--steps-per-epoch", "1", "--train-size", "8",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--log-dir", f"{tdir}/cls"])
    report = evaluate_cli.main([
        "classifier", "--ckpt", f"{tdir}/cls/ckpt", "--num-points", "64",
        "--batch-size", "4", "--test-size", "8", "--num-votes", "2",
        "--log-dir", f"{tdir}/eval"])
    assert 0.0 <= report["accuracy"] <= 1.0

    train_progressive.main([
        "--epochs", "1", "--steps-per-epoch", "1", "--train-size", "8",
        "--test-size", "8", "--num-points", "64", "--batch-size", "4",
        "--max-num-out-points", "16", "--min-num-out-points", "8",
        "--bottleneck-size", "32", "--group-size", "4",
        "--classifier-ckpt", f"{tdir}/cls/ckpt",
        "--log-dir", f"{tdir}/prog"])
    paths = evaluate_cli.main([
        "infer", "--ckpt", f"{tdir}/prog/ckpt", "--num-points", "64",
        "--batch-size", "4", "--test-size", "8", "--bottleneck-size", "32",
        "--group-size", "4", "--out-dir", f"{tdir}/dumps",
        "--log-dir", f"{tdir}/eval"])
    assert set(paths) == {"simplified", "soft_projected", "hard_projected",
                          "sampled"}
    accs = evaluate_cli.main([
        "from-files", "--dump", paths["sampled"],
        "--classifier-ckpt", f"{tdir}/cls/ckpt", "--sizes", "8", "16",
        "--batch-size", "4", "--test-size", "8", "--num-points", "64",
        "--log-dir", f"{tdir}/eval"])
    assert set(accs) == {8, 16}
