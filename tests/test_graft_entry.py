"""Mirror-gate decision for the dryrun compile-cache backup.

Two consecutive advisor rounds found bugs in this logic (r4: mismatched
mirrors were never purged, so the next restore resurfaced foreign AOT
entries; r5: a legacy UNSTAMPED mirror was restored anyway, round-tripping
its entries into the rebuilt backup under the current machine's stamp and
permanently defeating the gate). Pin the decision table.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def _make_backup(tmp_path, stamp):
    backup = tmp_path / "mirror"
    backup.mkdir()
    (backup / "some_aot_entry").write_bytes(b"x" * 16)
    if stamp is not None:
        (backup / "MACHINE_FP").write_text(stamp)
    return str(backup)


def test_matching_stamp_restores_without_purge(tmp_path):
    backup = _make_backup(tmp_path, ge._machine_fp())
    assert ge._mirror_restore_decision(backup) == (True, False)


def test_foreign_stamp_skips_restore_and_purges(tmp_path):
    backup = _make_backup(tmp_path, "not-this-machine")
    assert ge._mirror_restore_decision(backup) == (False, True)


def test_legacy_unstamped_skips_restore_and_purges(tmp_path):
    # The r5 finding: an unstamped mirror must NOT be restored — its
    # (possibly foreign) entries would be re-mirrored under the current
    # fingerprint by the post-run refresh.
    backup = _make_backup(tmp_path, None)
    assert ge._mirror_restore_decision(backup) == (False, True)
