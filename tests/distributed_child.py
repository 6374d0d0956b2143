"""Child process for the multi-process distributed tests.

Run as ``python distributed_child.py <pid> <nproc> <port>``: joins a
gloo-backed multi-process CPU cluster (4 virtual devices per process),
then verifies against single-process ground truth computed locally:

 1. cohort inference across processes (predict_cohort_distributed, both
    the local-shard and gathered return paths, uneven shard sizes);
 2. one sharded training step on a global mesh fed via distribute_batch
    (each process contributes only its own rows), loss equal everywhere
    and equal to the single-process loss.

Prints ``DIST_OK <pid>`` on success; any assertion kills the exit code.
"""

import os
import sys

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402


def tiny_engine(masked: bool = False):
    import jax.numpy as jnp  # noqa: F401
    from totalsegmentator2d_tpu.inference import EnsembleEngine
    from totalsegmentator2d_tpu.models.plans import (ArchSpec, ModelSpec,
                                                     PreprocessSpec)
    from totalsegmentator2d_tpu.models.unet import init_params_np

    pre = PreprocessSpec(
        spacing=(1.5, 1.5), patch_size=(32, 32),
        normalization_schemes=('ZScoreNormalization',) * 2,
        use_mask_for_norm=(masked, masked),
        intensity_properties=(None, None))
    specs, params = [], []
    for i, n_labels in enumerate((3, 4)):
        arch = ArchSpec(
            n_stages=3, features_per_stage=(8, 16, 32),
            kernel_sizes=((3, 3),) * 3, strides=((1, 1), (2, 2), (2, 2)),
            n_conv_per_stage=(2,) * 3, n_conv_per_stage_decoder=(2,) * 2,
            in_channels=2, out_channels=n_labels)
        specs.append(ModelSpec(
            arch=arch, preprocess=pre,
            labels={v + 1: f'g{i}-{v}' for v in range(n_labels)},
            channel_names={0: 'max', 1: 'mean'}, multilabel=True))
        params.append([init_params_np(i, arch)])
    return EnsembleEngine(specs, params)


def main(pid: int, nproc: int, port: int) -> None:
    from totalsegmentator2d_tpu.parallel.distributed import (
        distribute_batch, global_mesh, init_distributed, is_distributed,
        predict_cohort_distributed, process_shard)

    got_pid, got_n = init_distributed(f'localhost:{port}', nproc, pid)
    assert (got_pid, got_n) == (pid, nproc), (got_pid, got_n)
    assert is_distributed()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    # ---- cohort inference across processes -------------------------------
    rng = np.random.default_rng(7)  # same cohort in every process
    cohort = (rng.standard_normal((7, 20, 12, 16)) * 100 + 40).astype(
        np.float32)
    spacing, modes = (1.5, 1.5), ('max', 'mean')

    engine = tiny_engine()
    expected = engine.predict_cohort(cohort, spacing, modes)  # local truth

    mesh = global_mesh()
    assert dict(mesh.shape) == {'data': 4 * nproc}
    shard = process_shard(len(cohort))
    # 7 scans over 2 processes -> 4 + 3: uneven shards exercise the padding
    assert (shard.stop - shard.start) in (3, 4), shard

    mine = predict_cohort_distributed(engine, cohort[shard], spacing, modes,
                                      mesh=mesh)
    assert mine.shape == expected[shard].shape
    # the distributed batch pads to a different batch size than the local
    # cohort program: borderline sigmoid pixels may flip (the documented
    # batch-size-dependent numerics, docs/performance.md) — same tolerance
    # as the driver dryrun
    agree = (mine == expected[shard]).mean()
    assert agree > 0.9999, f'local shard diverged: agreement {agree:%}'

    full = predict_cohort_distributed(engine, cohort[shard], spacing, modes,
                                      mesh=mesh, gather=True)
    assert full.shape == expected.shape
    agree = (full == expected).mean()
    assert agree > 0.9999, f'gathered cohort diverged: agreement {agree:%}'

    # ---- masked-norm branch: local compute + uneven allgather -------------
    # masked-norm plans project on the HOST, so the distributed call serves
    # each process's shard locally and only the gather is a collective
    # (_gather_uneven pads/trims the unequal shard sizes)
    eng_m = tiny_engine(masked=True)
    pos = np.abs(cohort[:3]) + 10.0  # nonzero foreground for the mask
    exp_m = eng_m.predict_cohort(pos, spacing, modes)
    shard_m = process_shard(len(pos))
    full_m = predict_cohort_distributed(eng_m, pos[shard_m], spacing, modes,
                                        mesh=mesh, gather=True)
    assert full_m.shape == exp_m.shape
    assert np.array_equal(full_m, exp_m), 'masked-norm gather diverged'

    # ---- empty shards: a cohort smaller than the process count ------------
    # rank 1 contributes zero scans; the gather must still converge on both
    # branches (the empty rank joins the collectives with a 0-row block)
    sl1 = process_shard(1)
    full1 = predict_cohort_distributed(engine, cohort[:1][sl1], spacing,
                                       modes, mesh=mesh, gather=True)
    assert full1.shape == expected[:1].shape
    assert (full1 == expected[:1]).mean() > 0.9999, 'empty-shard cohort'
    full1m = predict_cohort_distributed(eng_m, pos[:1][sl1], spacing, modes,
                                        mesh=mesh, gather=True)
    assert np.array_equal(full1m, exp_m[:1]), 'empty-shard masked cohort'

    # ---- one sharded training step fed from per-process rows -------------
    from totalsegmentator2d_tpu.models.plans import ArchSpec
    from totalsegmentator2d_tpu.training import TrainConfig, Trainer

    spec = ArchSpec(
        n_stages=3, features_per_stage=(8, 16, 32),
        kernel_sizes=((3, 3),) * 3, strides=((1, 1), (2, 2), (2, 2)),
        n_conv_per_stage=(2,) * 3, n_conv_per_stage_decoder=(2,) * 2,
        in_channels=2, out_channels=4)
    cfg = TrainConfig(lr=1e-3, total_steps=4, multilabel=True,
                      deep_supervision=True)

    brng = np.random.default_rng(11)
    n_batch = 4 * nproc  # one row per device
    img = brng.standard_normal((n_batch, 32, 32, 2)).astype(np.float32)
    tgt = (brng.random((n_batch, 32, 32, 4)) > 0.7).astype(np.uint8)

    # single-process ground-truth loss (fresh trainer, same seed/batch)
    solo = Trainer(spec, cfg, seed=3)
    solo_loss = float(np.asarray(jax.device_get(
        solo.step({'image': img, 'target': tgt}))))

    trainer = Trainer(spec, cfg, mesh=mesh, seed=3)
    rows = process_shard(n_batch)
    batch = distribute_batch({'image': img[rows], 'target': tgt[rows]}, mesh)
    loss = float(np.asarray(jax.device_get(trainer.step(batch))))
    assert np.isfinite(loss)
    assert abs(loss - solo_loss) < 1e-4, (loss, solo_loss)

    from jax.experimental import multihost_utils as mh
    losses = np.asarray(mh.process_allgather(np.asarray([loss]))).reshape(-1)
    assert np.allclose(losses, losses[0]), losses

    print(f'DIST_OK {pid} loss={loss:.6f}', flush=True)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
