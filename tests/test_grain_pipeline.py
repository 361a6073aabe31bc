"""GrainPipeline: contract parity with the threaded DataPipeline."""

import numpy as np
import pytest

from vm_asr_tpu.core import default_config
from vm_asr_tpu.data import DegradingSampler, SyntheticVCTK
from vm_asr_tpu.data.grain_pipeline import GrainPipeline, grain_available

pytestmark = pytest.mark.skipif(not grain_available(), reason="grain absent")


def _sampler():
    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = 0.126
    c.DATA.STFT.N_FFT = 128
    c.DATA.RANDOM_RESAMPLE = [4000, 16000]
    ds = SyntheticVCTK(n_items=10, sr=16000, duration=0.2)
    return DegradingSampler(ds, c, training=True)


def test_shapes_and_len():
    pipe = GrainPipeline(_sampler(), batch_size=4, num_workers=0)
    assert len(pipe) == 2
    batches = list(pipe)
    assert len(batches) == 2
    b = batches[0]
    assert b.wave_input.shape == (4, 1, 2016)
    assert b.wave_target.shape == (4, 1, 2016)
    assert b.highcut.shape == (4,)
    assert len(b.names) == 4
    assert not np.allclose(b.wave_input, b.wave_target)


def test_epoch_determinism_and_reshuffle():
    pipe = GrainPipeline(_sampler(), batch_size=4, num_workers=0, seed=7)
    b0 = list(pipe)[0]
    b0_again = list(pipe)[0]
    np.testing.assert_array_equal(b0.wave_input, b0_again.wave_input)
    pipe.set_epoch(1)
    b1 = list(pipe)[0]
    assert not np.array_equal(b0.wave_input, b1.wave_input)


def test_multiprocess_workers():
    pipe = GrainPipeline(_sampler(), batch_size=4, num_workers=2)
    batches = list(pipe)
    assert len(batches) == 2
    assert np.isfinite(batches[0].wave_input).all()


def test_drop_last_false():
    pipe = GrainPipeline(_sampler(), batch_size=4, num_workers=0,
                         drop_last=False, shuffle=False)
    batches = list(pipe)
    assert len(batches) == 3
    assert batches[-1].wave_input.shape[0] == 2


def test_multihost_sharding_partition_and_determinism():
    """Simulated multi-host layout (SURVEY §2.3 "DCN for multi-host input"):
    per-host GrainPipelines with ShardOptions(i, n) must read DISJOINT,
    exhaustive record sets per epoch, deterministically for a given seed.
    (On a real topology shard_index/count come from jax.process_index/count;
    here every "host" runs in-process — grain's sharding is pure index
    arithmetic, so the layout is identical.)"""
    sampler = _sampler()  # 10 records
    n_hosts = 2

    def names_for(shard, epoch=0):
        pipe = GrainPipeline(sampler, batch_size=1, num_workers=0, seed=11,
                             shard_index=shard, shard_count=n_hosts)
        pipe.set_epoch(epoch)
        assert len(pipe) == 5  # 10 records / 2 hosts / batch 1
        return [b.names[0] for b in pipe]

    per_host = [names_for(i) for i in range(n_hosts)]
    flat = [n for names in per_host for n in names]
    # disjoint + exhaustive: every record exactly once across hosts
    assert sorted(flat) == sorted({n for n in flat})
    assert len(flat) == 10
    # deterministic per (seed, epoch)
    assert per_host[0] == names_for(0)
    # reshuffles across epochs, still a valid partition
    e1 = [names_for(i, epoch=1) for i in range(n_hosts)]
    assert sorted(n for ns in e1 for n in ns) == sorted(flat)
    assert e1[0] != per_host[0]


def test_shard_index_validation():
    with pytest.raises(ValueError):
        GrainPipeline(_sampler(), batch_size=1, shard_index=2, shard_count=2)


def test_loader_factory_grain(tmp_path):
    from vm_asr_tpu.data import get_loaders

    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = 0.126
    c.DATA.STFT.N_FFT = 128
    c.DATA.RANDOM_RESAMPLE = [4000, 16000]
    c.DATA.BATCH_SIZE = 4
    c.DATA.NUM_WORKERS = 0
    c.DATA.PIPELINE = "grain"
    c.EVAL_MODE = False
    ds = SyntheticVCTK(n_items=10, sr=16000, duration=0.2)
    train, valid = get_loaders(c, dataset=ds)
    assert isinstance(train, GrainPipeline)
    assert np.isfinite(next(iter(train)).wave_input).all()
