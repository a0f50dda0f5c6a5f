"""Dispatch-table staleness + completeness detection (VERDICT r2 weak
item 6; VERDICT r3 next-item 9).

Each entry of the measured attention dispatch table is stamped with a
hash of ``flash_attention.py`` at the time IT was swept (per-entry, so a
partial ``--shapes`` re-sweep cannot launder carried-over entries'
staleness); loading entries whose stamp does not match the current
kernel source must warn loudly. Entries whose winner was chosen while
some candidates failed to compile/measure (``candidates_failed > 0``)
must be called out as an incomplete sweep."""

import json
import logging
import os.path as osp

import diffuman4d_tpu.ops.attention as attn_mod


def _load_table(monkeypatch, tmp_path, mutate):
    real = osp.join(osp.dirname(attn_mod.__file__), "attention_table.json")
    data = json.load(open(real))
    mutate(data)
    p = tmp_path / "attention_table.json"
    p.write_text(json.dumps(data))
    monkeypatch.setattr(attn_mod, "_TABLE", None)
    real_join = osp.join
    monkeypatch.setattr(
        attn_mod.osp,
        "join",
        lambda *a: str(p) if a[-1] == "attention_table.json" else real_join(*a),
    )
    try:
        return attn_mod._dispatch_table()
    finally:
        # restore the module-level cache for other tests
        monkeypatch.setattr(attn_mod, "_TABLE", None)


def _stamp_all(data, kernel_hash, candidates_failed=0):
    data["kernel_hash"] = kernel_hash
    for e in data["entries"]:
        e["kernel_hash"] = kernel_hash
        e["candidates_failed"] = candidates_failed


def test_table_is_stamped_with_current_kernel_hash():
    path = osp.join(osp.dirname(attn_mod.__file__), "attention_table.json")
    data = json.load(open(path))
    cur = attn_mod.kernel_source_hash()
    for e in data["entries"]:
        assert e.get("kernel_hash", data.get("kernel_hash")) == cur, (
            f"attention_table.json entry {e['name']} is stale — re-run "
            "scripts/tune_attention.py after editing flash_attention.py"
        )


def test_stale_entries_warn(monkeypatch, tmp_path, caplog):
    with caplog.at_level(logging.WARNING, logger=attn_mod.__name__):
        entries = _load_table(
            monkeypatch, tmp_path,
            lambda d: _stamp_all(d, "deadbeef00000000"),
        )
    assert entries, "table should still load"
    assert any("stale" in r.message for r in caplog.records)


def test_partial_resweep_cannot_launder_staleness(monkeypatch, tmp_path, caplog):
    """A fresh table-level stamp must NOT mask entries measured under an
    older kernel — per-entry hashes win (ADVICE r3 item 2)."""
    cur = attn_mod.kernel_source_hash()

    def mutate(d):
        _stamp_all(d, cur)
        d["entries"][0]["kernel_hash"] = "0ld0ld0ld0ld0ld0"

    with caplog.at_level(logging.WARNING, logger=attn_mod.__name__):
        entries = _load_table(monkeypatch, tmp_path, mutate)
    assert entries
    stale = [r for r in caplog.records if "stale" in r.message]
    assert stale and entries[0]["name"] in stale[0].getMessage()


def test_incomplete_sweep_warns(monkeypatch, tmp_path, caplog):
    cur = attn_mod.kernel_source_hash()
    with caplog.at_level(logging.WARNING, logger=attn_mod.__name__):
        entries = _load_table(
            monkeypatch, tmp_path,
            lambda d: _stamp_all(d, cur, candidates_failed=2),
        )
    assert entries
    assert any("failed candidates" in r.message for r in caplog.records)


def test_fresh_complete_table_does_not_warn(monkeypatch, tmp_path, caplog):
    cur = attn_mod.kernel_source_hash()
    with caplog.at_level(logging.WARNING, logger=attn_mod.__name__):
        entries = _load_table(
            monkeypatch, tmp_path,
            lambda d: _stamp_all(d, cur, candidates_failed=0),
        )
    assert entries
    assert not caplog.records
