"""Every leaf config in configs/ loads and its model builds.

This sweeps the whole zoo (the reference's config families rebuilt for
arfe_tpu): Config.fromfile + build_detector with the config's own
train/test cfg. Build only — params are not initialized (that is covered
per-family by the smoke tests)."""
import glob
import os

import pytest

from arfe_tpu import Config
from arfe_tpu.models.builder import build_detector

ROOT = os.path.join(os.path.dirname(__file__), '..', 'configs')
LEAVES = sorted(
    p for p in glob.glob(os.path.join(ROOT, '**', '*.py'), recursive=True)
    if '_base_' not in p)


@pytest.mark.parametrize(
    'path', LEAVES, ids=[os.path.relpath(p, ROOT) for p in LEAVES])
def test_leaf_config_builds(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg, f'{path} has no model section'
    det = build_detector(cfg.model,
                         train_cfg=cfg.get('train_cfg'),
                         test_cfg=cfg.get('test_cfg'))
    assert det is not None
    # data section sanity: pipelines declared for train/val/test
    if 'data' in cfg:
        for split in ('train', 'val', 'test'):
            assert split in cfg.data
