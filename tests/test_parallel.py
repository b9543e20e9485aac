"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
decode step must be bit-exact with the single-device path, collective-free,
and the driver entry points must work."""

import sys
import pathlib

import numpy as np
import pytest

import jax

from claxon_tpu import FlacReader
from claxon_tpu.extract import extract_stream
from claxon_tpu.parallel import (make_mesh, make_decode_step,
                                 decode_batch_sharded, lane_quantum)
from claxon_tpu.pipeline import decode_batch
from claxon_tpu.testing import encode_flac, synth_music
from util import decode_all_blocks, interleave

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_lane_quantum_pair_aligned():
    mesh = make_mesh(8)
    q = lane_quantum(mesh)
    assert q % 128 == 0 and q % (2 * 8) == 0


@needs_8
@pytest.mark.parametrize("n", [2, 8])
def test_sharded_matches_single_device(n):
    pcm = synth_music(9000, channels=2, bps=16, seed=21)
    data = encode_flac(pcm, 44100, 16, block_size=1024)
    batch = extract_stream(data)
    single = decode_batch(batch)
    sharded = decode_batch_sharded(batch, make_mesh(n))
    assert np.array_equal(single.pcm, sharded.pcm)
    scalar = interleave(decode_all_blocks(FlacReader(bytes(data))))
    assert np.array_equal(sharded.pcm, scalar)


@needs_8
def test_decode_step_collective_free():
    mesh = make_mesh(8)
    step = make_decode_step(mesh)
    L = lane_quantum(mesh)
    x = np.zeros((L, 64), np.int32)
    coefs = np.zeros((L, 32), np.int32)
    vec = np.zeros(L, np.int32)
    hlo = step.lower(x, coefs, vec, vec, vec,
                     np.zeros(L // 2, np.int32), vec).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in hlo


def test_graft_entry_single_chip():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    # With the native core the entry step is the full bits program on a
    # real encoded bucket: (L, T) PCM from (stream, mb) inputs. Without
    # it, the synthesis step maps x -> out of the same shape.
    L = args[-1].shape[0]
    assert out.ndim == 2 and out.shape[0] == L
    assert np.asarray(out).any()


@needs_8
def test_graft_entry_multichip():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("n", [16, 32])
def test_sharded_wider_meshes(n):
    """The README's 16/32-virtual-device claim, reproducible from the
    tree: a fresh process forces an n-device CPU platform, runs
    decode_streams_sharded, and checks bit-exactness against the host
    scalar oracle plus a collective-free compiled stream program."""
    import os
    import subprocess

    root = str(pathlib.Path(__file__).resolve().parent.parent)
    script = (
        "import sys, os; sys.path.insert(0, %r)\n"
        "os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_"
        "device_count=%d')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == %d\n"
        "import numpy as np\n"
        "import claxon_tpu.pipeline_bits as pb\n"
        "from claxon_tpu import native\n"
        "from claxon_tpu.parallel import make_mesh, decode_streams_sharded\n"
        "from claxon_tpu.testing import encode_flac, synth_music\n"
        "datas = [encode_flac(synth_music(1024 * 3, channels=2, bps=16,\n"
        "                                 seed=s), 44100, 16,\n"
        "                     block_size=1024) for s in (41, 42)]\n"
        "captured = {}\n"
        "orig = pb._stream_program\n"
        "def capture(*key, **kw):\n"
        "    prog = orig(*key, **kw)\n"
        "    def wrapped(*args):\n"
        "        captured.setdefault('pa', (prog, args))\n"
        "        return prog(*args)\n"
        "    return wrapped\n"
        "pb._stream_program = capture\n"
        "try:\n"
        "    res = decode_streams_sharded(datas, make_mesh(%d))\n"
        "finally:\n"
        "    pb._stream_program = orig\n"
        "for data, dec in zip(datas, res):\n"
        "    _si, pcm = native.decode_stream_scalar(data)\n"
        "    assert np.array_equal(dec.pcm, pcm), 'not bit-exact'\n"
        "if 'pa' in captured:\n"
        "    prog, pargs = captured['pa']\n"
        "    hlo = prog.lower(*pargs).compile().as_text()\n"
        "    for op in ('all-reduce', 'all-gather', 'collective-permute',\n"
        "               'all-to-all', 'reduce-scatter'):\n"
        "        assert op not in hlo, op\n"
        "print('MESH%d_OK')\n" % (root, n, n, n, n))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, env=env, timeout=900, cwd=root)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"MESH{n}_OK" in r.stdout


def test_dryrun_multichip_never_touches_other_backends():
    """Round-2 regression: dryrun_multichip crashed when the process
    default (TPU) backend was broken, because some per-bucket arrays were
    placed on the default device instead of the CPU mesh. The dryrun's
    contract is to be CPU-only regardless of any other backend's health:
    run it in a fresh process (no XLA_FLAGS pin, platform default as the
    environment ships it) and assert no non-CPU backend ever initialized.
    """
    import os
    import subprocess

    root = str(pathlib.Path(__file__).resolve().parent.parent)
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(8)\n"
        "from jax._src import xla_bridge as xb\n"
        "inited = set(getattr(xb, '_backends', {}))\n"
        "assert inited <= {'cpu'}, 'non-CPU backends touched: %%s' %% inited\n"
        "print('DRYRUN_OK')\n" % root)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, env=env, timeout=900, cwd=root)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DRYRUN_OK" in r.stdout


@needs_8
def test_decode_streams_sharded():
    from claxon_tpu.parallel import decode_streams_sharded
    from claxon_tpu.pipeline import decode_streams

    datas = [encode_flac(synth_music(5000, channels=2, bps=16, seed=s),
                         44100, 16, block_size=1024) for s in (31, 32, 33)]
    sharded = decode_streams_sharded(datas, make_mesh(8))
    single = decode_streams(datas)
    assert len(sharded) == len(single) == len(datas)
    for a, b in zip(sharded, single):
        assert np.array_equal(a.pcm, b.pcm)


@needs_8
@pytest.mark.slow
def test_decode_streams_sharded_segmented():
    """The segmented (device-demux) path lane-sharded over the 8-device
    mesh: must engage, stay bit-exact with the single-device path, and
    compile collective-free (VERDICT r3 item 4)."""
    import claxon_tpu.pipeline_seg as pseg
    from claxon_tpu import native
    from claxon_tpu.pipeline import decode_streams

    if not native.available():
        pytest.skip("native core unavailable")

    datas = [encode_flac(synth_music(5000, channels=2, bps=16, seed=s),
                         44100, 16, block_size=1024) for s in (34, 35, 36)]
    captured = {}
    orig = pseg._seg_decode_program

    def capture(*key, **kw):
        prog = orig(*key, **kw)

        def wrapped(*args):
            captured.setdefault("pa", (prog, args))
            return prog(*args)

        return wrapped

    pseg._seg_decode_program = capture
    try:
        dd = pseg.decode_streams_segmented(datas, mesh=make_mesh(8))
        sharded = dd.to_host()
    finally:
        pseg._seg_decode_program = orig
    assert getattr(dd, "segmented", False)
    single = decode_streams(datas)
    for a, b in zip(sharded, single):
        assert np.array_equal(a.pcm, b.pcm)
    prog, pargs = captured["pa"]
    hlo = prog.lower(*pargs).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in hlo, op
