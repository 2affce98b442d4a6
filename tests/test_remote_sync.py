"""Remote-sync tests (local→local fsspec; semantics of reference
file_utils.py:62-128: skip epoch_latest, skip same-size)."""

import os
import time

from mamba_clip_tpu.checkpoint import RemoteSyncThread, remote_sync


def _write(p, content):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(content)


def test_remote_sync_copies_and_skips(tmp_path):
    local = tmp_path / "local"
    remote = tmp_path / "remote"
    _write(str(local / "checkpoints" / "results.jsonl"), "{}\n")
    _write(str(local / "checkpoints" / "stage_1_epoch_latest" / "x"), "AAAA")
    _write(str(local / "params.txt"), "seed: 0\n")

    assert remote_sync(str(local), str(remote))
    assert (remote / "checkpoints" / "results.jsonl").exists()
    assert (remote / "params.txt").exists()
    # epoch_latest skipped (reference: file_utils.py:117-119)
    assert not (remote / "checkpoints" / "stage_1_epoch_latest").exists()

    # same-size files are not re-copied: mtime stays put
    first = (remote / "params.txt").stat().st_mtime_ns
    time.sleep(0.01)
    assert remote_sync(str(local), str(remote))
    assert (remote / "params.txt").stat().st_mtime_ns == first

    # changed size → re-copied
    _write(str(local / "params.txt"), "seed: 0\nextra: 1\n")
    assert remote_sync(str(local), str(remote))
    assert (remote / "params.txt").read_text().endswith("extra: 1\n")


def test_sync_thread_start_stop(tmp_path):
    local = tmp_path / "l"
    _write(str(local / "a.txt"), "x")
    t = RemoteSyncThread(str(local), str(tmp_path / "r"), frequency=3600)
    t.start()
    t.stop()
    t.join(timeout=5)
    assert not t.is_alive()
