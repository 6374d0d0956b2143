"""Probe 21 — does an UPLOAD overlap a running program through the relay?

Post-adaptive-ramp bench cadence is ~520 ms per batch-8 against a 402 ms
device program and a ~120 ms stacked upload: if the relay serialized the
device_put behind the running program, the sum (522) matches the cadence
exactly; if transfers ride concurrently with execution the cadence should
approach max(402, 120) + download.

Method: enqueue the batch-8 torso program on a device-resident input, then
immediately device_put a fresh host buffer of the production stacked-batch
size and sync ONLY the put (a tiny scalar reduce of the uploaded array).
If the put syncs in ~transfer-time the relay overlaps; if it syncs only
after ~program-time the relay serializes. A control run times the same put
with an idle device.

Usage: python tools/perf_probe21.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from tools.perf_probe import sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_engine, host_project, make_realistic_volume
    from totalsegmentator2d_tpu.inference.ensemble_engine import (
        _nonzero_bbox, _wire_pack, wire_detect)

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)
    arr = host_project(vol)
    (y0, y1), (x0, x1) = _nonzero_bbox(arr)
    cropped = np.ascontiguousarray(arr[y0:y1, x0:x1])
    wire = wire_detect(cropped)
    if not any(wire):
        wire = None
    B = eng._batcher.max_batch
    fn, _ = eng._batched_program(B, cropped.shape[:2], tuple(sp), False,
                                 wire)
    stacked = _wire_pack(np.stack([cropped] * B), wire)
    xb = jax.device_put(stacked)

    # the calibration sync must depend on EVERY wire component (the int16
    # wire returns a tuple; summing only t[0] would leave the float
    # component's upload unawaited and under-measure put-synced)
    red = jax.jit(lambda t: sum(jnp.sum(a.astype(jnp.int32)) for a in t)
                  if isinstance(t, tuple) else jnp.sum(t))

    def out_sync(out):
        t = out[1] if isinstance(out, tuple) else out
        np.asarray(jax.device_get(t[:1, :8] if t.ndim > 1 else t[:8]))

    # warm both programs
    out_sync(fn(eng.params, xb))
    sync(red(jax.device_put(stacked)))

    def fresh():
        # fresh host buffers each time: no transfer-cache reuse
        if isinstance(stacked, tuple):
            return tuple(a + 0 for a in stacked)
        return stacked + 0

    # sync choices: a scalar-reduce sync QUEUES A PROGRAM behind the big
    # one (it would measure queue depth, not transfer overlap), so the
    # busy case must sync the put via block_until_ready on the put's
    # arrays. Calibrate block_until_ready against the reduce sync on the
    # idle device first: if idle put-block ~= idle put-synced, the relay's
    # block_until_ready actually awaits the transfer and the busy number
    # is trustworthy.
    def put_block(d):
        for leaf in (d if isinstance(d, tuple) else (d,)):
            leaf.block_until_ready()

    for tag, busy in (('idle', False), ('busy', True),
                      ('idle2', False), ('busy2', True)):
        h = fresh()
        if busy:
            t_prog0 = time.perf_counter()
            out = fn(eng.params, xb)  # async: program enqueued
        t0 = time.perf_counter()
        d = jax.device_put(h)
        t_put_ret = time.perf_counter() - t0
        put_block(d)
        t_put_blocked = time.perf_counter() - t0
        line = (f'{tag}: put-return {t_put_ret*1e3:7.1f} ms, '
                f'put-blocked {t_put_blocked*1e3:7.1f} ms')
        if not busy:
            sync(red(d))
            line += f', put-synced {(time.perf_counter()-t0)*1e3:7.1f} ms'
        else:
            out_sync(out)
            line += (f', program total '
                     f'{(time.perf_counter()-t_prog0)*1e3:7.1f} ms')
        print(line)


if __name__ == '__main__':
    main()
