import os

import numpy as np
import jax.numpy as jnp

from aadg_tpu.utils import (save_checkpoint, load_checkpoint,
                            latest_checkpoint, save_json)


def test_roundtrip_and_latest(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "epoch": 7,
        "best_dsc": 0.5,
    }
    p1 = save_checkpoint(state, is_best=False, output_dir=str(tmp_path),
                         filename="checkpoint_7.msgpack")
    assert os.path.exists(p1)
    # latest points at a real file (reference bug fixed: utils.py:217-221
    # symlinked a never-written file)
    latest = latest_checkpoint(str(tmp_path))
    assert latest and os.path.exists(latest)

    restored = load_checkpoint(latest, target=state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert restored["epoch"] == 7

    # raw restore without a template
    raw = load_checkpoint(latest)
    assert "params" in raw


def test_best_checkpoint_written(tmp_path):
    state = {"params": {"w": jnp.ones(4)}, "epoch": 1}
    save_checkpoint(state, is_best=True, output_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "model_best.msgpack")


def test_latest_replaced_across_saves(tmp_path):
    s = {"x": jnp.zeros(1), "epoch": 0}
    save_checkpoint(s, False, str(tmp_path), "checkpoint_0.msgpack")
    s2 = {"x": jnp.ones(1), "epoch": 1}
    save_checkpoint(s2, False, str(tmp_path), "checkpoint_1.msgpack")
    restored = load_checkpoint(latest_checkpoint(str(tmp_path)), target=s)
    assert restored["epoch"] == 1


def test_save_json(tmp_path):
    save_json({"dsc": np.float32(0.5), "epoch": 3},
              str(tmp_path / "final_result.json"))
    import json
    with open(tmp_path / "final_result.json") as f:
        data = json.load(f)
    assert data["dsc"] == 0.5


def test_fetch_tree_packed_roundtrip():
    """fetch_tree (packed O(#dtypes)-transfer device fetch) preserves
    values, shapes, dtypes and non-array leaves."""
    import jax
    import jax.numpy as jnp
    from aadg_tpu.utils import fetch_tree

    tree = {"a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            "b": {"c": jnp.ones((2, 2), jnp.int32) * 7,
                  "d": jnp.full((5,), 0.5, jnp.bfloat16)},
            "epoch": 3, "note": np.asarray([1.0, 2.0])}
    host = fetch_tree(tree)
    np.testing.assert_array_equal(
        np.asarray(host["a"]),
        np.arange(12, dtype=np.float32).reshape(3, 4))
    np.testing.assert_array_equal(np.asarray(host["b"]["c"]),
                                  np.full((2, 2), 7, np.int32))
    assert host["b"]["d"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(host["b"]["d"], np.float32), np.full((5,), 0.5))
    assert host["epoch"] == 3
    np.testing.assert_array_equal(host["note"], [1.0, 2.0])


def test_background_save_and_resume(tmp_path):
    import jax.numpy as jnp
    from aadg_tpu.utils import (save_checkpoint, load_checkpoint,
                                latest_checkpoint,
                                wait_pending_checkpoints)

    state = {"w": jnp.arange(6, dtype=jnp.float32), "epoch": 5}
    save_checkpoint(state, True, str(tmp_path), "checkpoint_5.msgpack",
                    background=True)
    wait_pending_checkpoints()
    ck = latest_checkpoint(str(tmp_path))
    assert ck and ck.endswith("checkpoint_5.msgpack")
    restored = load_checkpoint(ck, {"w": jnp.zeros(6), "epoch": 0})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(6, dtype=np.float32))
    assert int(restored["epoch"]) == 5
    assert (tmp_path / "model_best.msgpack").exists()


def test_background_save_error_propagates(tmp_path):
    import jax.numpy as jnp
    import pytest
    from aadg_tpu.utils import save_checkpoint, wait_pending_checkpoints

    state = {"w": jnp.zeros(4)}
    save_checkpoint(state, False, str(tmp_path), "ck.msgpack",
                    background=True)
    wait_pending_checkpoints()  # first save fine
    # a directory squatting on the tmp file makes the write fail
    (tmp_path / "ck2.msgpack.tmp").mkdir()
    save_checkpoint(state, False, str(tmp_path), "ck2.msgpack",
                    background=True)
    with pytest.raises(OSError):
        wait_pending_checkpoints()


def test_find_resume_checkpoint_across_timestamped_dirs(tmp_path):
    """AUTO_RESUME must find the crashed run's checkpoint even though each
    run gets a fresh <cfg>_<timestamp> dir."""
    import jax.numpy as jnp
    from aadg_tpu.utils import find_resume_checkpoint, save_checkpoint

    old = tmp_path / "diversity_2026-08-16-10-00"
    older = tmp_path / "diversity_2026-08-15-09-00"
    new = tmp_path / "diversity_2026-08-17-11-30"
    new.mkdir()
    save_checkpoint({"w": jnp.zeros(2)}, False, str(older), "c1.msgpack")
    save_checkpoint({"w": jnp.ones(2)}, False, str(old), "c7.msgpack")
    ck = find_resume_checkpoint(str(new))
    assert ck and ck.endswith("c7.msgpack") and "2026-08-16" in ck
    # a checkpoint in the run's own dir wins
    save_checkpoint({"w": jnp.ones(2)}, False, str(new), "c9.msgpack")
    assert find_resume_checkpoint(str(new)).endswith("c9.msgpack")
    # unrelated config prefixes are not picked up
    other = tmp_path / "othercfg_2026-08-17-11-31"
    assert find_resume_checkpoint(str(other)) is None


def test_find_resume_rejects_extended_stems(tmp_path):
    """A sibling run dir of a DIFFERENT config whose name extends the stem
    ('diversity' vs 'diversity_ablation_<ts>') must NOT be resumed from."""
    import jax.numpy as jnp
    from aadg_tpu.utils import find_resume_checkpoint, save_checkpoint

    foreign = tmp_path / "diversity_ablation_2026-08-16-10-00"
    save_checkpoint({"w": jnp.zeros(2)}, False, str(foreign), "c1.msgpack")
    mine = tmp_path / "diversity_2026-08-17-11-30"
    mine.mkdir()
    assert find_resume_checkpoint(str(mine)) is None
    # and vice versa: 'diversity_ablation' runs don't see plain 'diversity'
    save_checkpoint({"w": jnp.ones(2)}, False,
                    str(tmp_path / "diversity_2026-08-16-09-00"),
                    "c2.msgpack")
    abl_new = tmp_path / "diversity_ablation_2026-08-17-12-00"
    abl_new.mkdir()
    ck = find_resume_checkpoint(str(abl_new))
    assert ck and ck.endswith("c1.msgpack")


def test_load_checkpoint_lenient_missing_key(tmp_path):
    """Old checkpoints lacking newly-added top-level keys (best_metric)
    restore with the target's default instead of raising."""
    import jax.numpy as jnp
    from aadg_tpu.utils import save_checkpoint, load_checkpoint_lenient

    old_state = {"w": jnp.arange(3, dtype=jnp.float32), "epoch": 4}
    p = save_checkpoint(old_state, False, str(tmp_path), "old.msgpack")
    target = {"w": jnp.zeros(3), "epoch": 0,
              "best_metric": {"epoch": 0, "avg_dsc": 0.0}}
    restored = load_checkpoint_lenient(p, target)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(3, dtype=np.float32))
    assert int(restored["epoch"]) == 4
    assert restored["best_metric"] == {"epoch": 0, "avg_dsc": 0.0}
    # exact-match checkpoints still restore every key
    full = {"w": jnp.ones(3), "epoch": 9,
            "best_metric": {"epoch": 9, "avg_dsc": 0.8}}
    p2 = save_checkpoint(full, False, str(tmp_path), "full.msgpack")
    restored = load_checkpoint_lenient(p2, target)
    assert float(restored["best_metric"]["avg_dsc"]) == 0.8
