"""Driver-runnable capture of the E2E CLI recipe (VERDICT r4 item 7).

Runs ``tools/e2e_smoke.py`` — train -> resume -> test --eval bbox on a
synthetic tiny-COCO set, all through the real CLIs in subprocesses — so a
regression anywhere in the L7 stack (config load, dataset/loader build,
epoch loop, checkpointing, resume fidelity, eval protocol; ref:
tools/train.py:65, tools/test.py:71) fails the default suite instead of
waiting for someone to re-run the verify-skill recipe by hand.

~5-6 min on CPU (three detector-train/eval subprocesses at 160x128).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_e2e_cli_train_resume_eval(tmp_path):
    r = subprocess.run(
        [sys.executable, 'tools/e2e_smoke.py', '--root', str(tmp_path)],
        capture_output=True, text=True, timeout=1740, cwd=REPO)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith('{')]
    assert lines, f'no JSON verdict; stdout={r.stdout[-800:]} ' \
                  f'stderr={r.stderr[-800:]}'
    out = json.loads(lines[-1])
    assert r.returncode == 0 and out['ok'], out
    assert out['stages']['train']['n_loss_lines'] > 0
    assert out['stages']['resume']['rc'] == 0
    assert out['stages']['test']['bbox_mAP'] is not None
