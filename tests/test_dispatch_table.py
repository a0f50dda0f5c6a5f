"""Dispatch-table staleness detection (VERDICT r2 weak item 6).

The measured attention dispatch table is stamped with a hash of
``flash_attention.py`` at sweep time; loading a table whose stamp does
not match the current kernel source must warn loudly."""

import json
import logging
import os.path as osp

import diffuman4d_tpu.ops.attention as attn_mod


def _load_table_fresh(monkeypatch, tmp_path, kernel_hash):
    real = osp.join(osp.dirname(attn_mod.__file__), "attention_table.json")
    data = json.load(open(real))
    data["kernel_hash"] = kernel_hash
    p = tmp_path / "attention_table.json"
    p.write_text(json.dumps(data))
    monkeypatch.setattr(attn_mod, "_TABLE", None)
    real_join = osp.join
    monkeypatch.setattr(
        attn_mod.osp,
        "join",
        lambda *a: str(p) if a[-1] == "attention_table.json" else real_join(*a),
    )
    return attn_mod._dispatch_table()


def test_table_is_stamped_with_current_kernel_hash():
    path = osp.join(osp.dirname(attn_mod.__file__), "attention_table.json")
    data = json.load(open(path))
    assert data.get("kernel_hash") == attn_mod.kernel_source_hash(), (
        "attention_table.json is stale — re-run scripts/tune_attention.py "
        "after editing flash_attention.py"
    )


def test_stale_table_warns(monkeypatch, tmp_path, caplog):
    with caplog.at_level(logging.WARNING, logger=attn_mod.__name__):
        entries = _load_table_fresh(monkeypatch, tmp_path, "deadbeef00000000")
    assert entries, "table should still load"
    assert any("stale" in r.message for r in caplog.records)
    # restore the module-level cache for other tests
    monkeypatch.setattr(attn_mod, "_TABLE", None)


def test_fresh_table_does_not_warn(monkeypatch, tmp_path, caplog):
    with caplog.at_level(logging.WARNING, logger=attn_mod.__name__):
        entries = _load_table_fresh(
            monkeypatch, tmp_path, attn_mod.kernel_source_hash()
        )
    assert entries
    assert not caplog.records
    monkeypatch.setattr(attn_mod, "_TABLE", None)
