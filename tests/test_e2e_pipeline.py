"""End-to-end CLI pipeline test: the whole framework through main().

Covers the full reference workflow in-process on tiny synthetic data:
train -> extract_feature -> build_index -> test_all -> test -> export ->
verify_export, then the parity job. This is the top of the test pyramid;
subsystem details are covered by the per-module tests.
"""

import numpy as np
import pytest

from nann_tpu import main as cli


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    argv = [
        "--job-type", "all", "--synthetic",
        "--num-item", "2000", "--num-cate", "30", "--num-users", "250",
        "--max-seq-length", "12", "--batch-size", "64", "--num-neg", "16",
        "--train-epochs", "10", "--max-steps", "80",
        "--top-k-per-level", "150", "80", "40", "--topk-eval", "80",
        "--num-test-batch", "32", "--frontier-cap", "512",
        "--print-freq", "40", "--save-freq", "60",
        "--output-root", out,
    ]
    cli.main(argv)
    return out, argv


def test_artifacts_exist(pipeline_out):
    import os
    out, _ = pipeline_out
    for rel in ("model", "embeddings/item_ids.npy", "embeddings/item_embs.npy",
                "index/enter_points.npy", "index/neighbors_level_0_values.npy",
                "export/scorer_params.npz", "export/model_config.json",
                "export/index/enter_points.npy"):
        assert os.path.exists(os.path.join(out, rel)), rel


def test_embeddings_shape(pipeline_out):
    out, _ = pipeline_out
    embs = np.load(f"{out}/embeddings/item_embs.npy")
    assert embs.shape == (2000, 64)
    assert np.isfinite(embs).all()


def test_parity_job(pipeline_out):
    out, argv = pipeline_out
    args = cli.parse_opt([a if a != "all" else "parity" for a in argv])
    mcfg, tcfg, scfg = cli.build_configs(args)
    paths = cli.Paths(out)
    report = cli.job_parity(args, mcfg, tcfg, scfg, paths)
    # the graph search must recover a large fraction of the oracle's recall
    assert report["parity@80"] > 0.6, report


def test_select_checkpoint_deploy_by_oracle(pipeline_out):
    """select_checkpoint writes the oracle winner and downstream jobs
    restore it instead of the latest (reference test_all-then-deploy flow,
    NANN_impls/main.py:194-237)."""
    import json
    import os
    out, argv = pipeline_out
    args = cli.parse_opt([a if a != "all" else "select_checkpoint"
                          for a in argv])
    mcfg, tcfg, scfg = cli.build_configs(args)
    paths = cli.Paths(out)
    sel = cli.job_select_checkpoint(args, mcfg, tcfg, scfg, paths)
    sel_path = os.path.join(out, "model", "selected_step.json")
    assert os.path.exists(sel_path)
    with open(sel_path) as f:
        on_disk = json.load(f)
    assert on_disk["step"] == sel["step"]
    # every retained checkpoint was evaluated, winner is the argmax
    evaluated = {int(k): v for k, v in on_disk["evaluated"].items()}
    from nann_tpu.train.loop import checkpoint_steps
    assert sorted(evaluated) == checkpoint_steps(os.path.join(out, "model"))
    assert on_disk["step"] == max(evaluated, key=evaluated.get)
    # downstream restore prefers the selection
    state = cli._restore(mcfg, tcfg, paths)
    assert int(state.step) == sel["step"]
    # explicit step overrides selection
    latest = max(evaluated)
    state = cli._restore(mcfg, tcfg, paths, step=latest)
    assert int(state.step) == latest


def test_select_checkpoint_by_graph_recall(pipeline_out):
    """--select-metric graph evaluates each checkpoint END-TO-END through a
    gt-covering subset HNSW (the shipping metric) instead of the oracle
    ceiling. Round-5 forensics: at 4.2M the two criteria diverge 4x
    (docs/DESIGN.md) — oracle-flat checkpoints can be graph-unroutable."""
    import json
    import os
    out, argv = pipeline_out
    args = cli.parse_opt([a if a != "all" else "select_checkpoint"
                          for a in argv] +
                         ["--select-metric", "graph",
                          "--select-subset", "800"])
    mcfg, tcfg, scfg = cli.build_configs(args)
    paths = cli.Paths(out)
    sel = cli.job_select_checkpoint(args, mcfg, tcfg, scfg, paths)
    assert sel["metric"] == "graph_recall@80"
    evaluated = {int(k): v for k, v in sel["evaluated"].items()}
    assert sel["step"] == max(evaluated, key=evaluated.get)
    # on the tiny corpus the trained checkpoints must actually route:
    # the winner's subset-graph recall is meaningfully nonzero
    assert sel["scores"]["graph_recall@80"] > 0.2, sel
    # per-checkpoint scratch indexes are cleaned up
    leftovers = [d for d in os.listdir(os.path.join(out, "model"))
                 if d.startswith("select_idx_")]
    assert leftovers == []
    # the graph cache is separate from the oracle cache
    assert os.path.exists(os.path.join(
        out, "model", "select_cache_graph_u32_float32.json"))
    # restore the oracle selection for the downstream tests (fixture is
    # module-scoped and test_select_checkpoint_deploy_by_oracle asserted
    # the oracle winner is on disk)
    oargs = cli.parse_opt([a if a != "all" else "select_checkpoint"
                           for a in argv])
    cli.job_select_checkpoint(oargs, mcfg, tcfg, scfg, paths)
    with open(os.path.join(out, "model", "selected_step.json")) as f:
        assert "recall@80" == json.load(f)["metric"]


def test_resume_then_more_training(pipeline_out):
    """Auto-resume semantics: max_steps is a TOTAL budget. A resumed run
    completes the remaining schedule (not a full extra budget), and a budget
    the checkpoint already met is a no-op."""
    out, argv = pipeline_out
    args = cli.parse_opt(argv)
    mcfg, tcfg, scfg = cli.build_configs(args)
    paths = cli.Paths(out)

    # budget already met by the pipeline's 80-step run -> nothing to do
    args.max_steps = 5
    state = cli.job_train(args, mcfg, tcfg, scfg, paths)
    assert int(state.step) == 80

    # a larger budget continues from the checkpoint to exactly the budget
    args.max_steps = 85
    state = cli.job_train(args, mcfg, tcfg, scfg, paths)
    assert int(state.step) == 85
