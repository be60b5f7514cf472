"""Two-process jax.distributed smoke test on the CPU backend (no pod)."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from ntjoin_tpu.parallel.distributed import initialize, global_mesh, gather_counts
pid = int(sys.argv[1])
initialize({coord!r}, 2, pid, local_device_count=4)
mesh = global_mesh()
assert mesh.devices.size == 8, mesh.devices.size
total = gather_counts(mesh, 10 + pid)
print("TOTAL", total, flush=True)
"""


def test_two_process_mesh(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO, coord=coord))
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err
        outs.append(out)
    # per-device values: 4 devices with 10, 4 with 11 -> 84
    for out in outs:
        assert "TOTAL 84" in out


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_SCAFFOLD_WORKER = '''
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from ntjoin_tpu.parallel.distributed import (
    initialize, global_mesh, distributed_survive,
)

pid = int(sys.argv[1])
work = {work!r}
initialize({coord!r}, 2, pid, local_device_count=4)
mesh = global_mesh()
n_dev = mesh.devices.size

from ntjoin_tpu.io.fasta import read_fasta
from ntjoin_tpu.ops.nthash_np import sketch_codes
from jax.experimental import multihost_utils

k, w, n_asm = 32, 1000, 2
fastas = ["ref.fa", "scaf.f-f.fa"]  # assembly order: references, then target

# every assembly is record-sharded round-robin across processes; each
# process sketches only its records (NO local dedup -- uniqueness is a
# global verdict, the whole point of the collective)
names = {{}}
asms, ctgs, poss, los, his = [], [], [], [], []
for a, fa in enumerate(fastas):
    recs = read_fasta(os.path.join(work, fa))
    names[a] = [r.id for r in recs]
    for ri, rec in enumerate(recs):
        if ri % 2 != pid:
            continue
        sk = sketch_codes(rec.codes, k, w)
        m = sk.hashes.shape[0]
        asms.append(np.full(m, a, np.int32))
        ctgs.append(np.full(m, ri, np.int32))
        poss.append(sk.positions.astype(np.int32))
        los.append((sk.hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        his.append((sk.hashes >> np.uint64(32)).astype(np.uint32))

def cat(parts, dtype):
    return (np.concatenate(parts) if parts else np.empty(0, dtype)).astype(dtype)

asm_l, ctg_l = cat(asms, np.int32), cat(ctgs, np.int32)
pos_l, lo_l, hi_l = cat(poss, np.int32), cat(los, np.uint32), cat(his, np.uint32)
n_local = lo_l.shape[0]

# agree on the per-device padded width
counts = multihost_utils.process_allgather(np.array([n_local], np.int32))
max_n = int(counts.max())
L = max(64, -(-max_n // 4))
L = 1 << (L - 1).bit_length()

def pack(x, fill):
    buf = np.full(4 * L, fill, x.dtype)
    buf[:n_local] = x
    return buf.reshape(4, L)

from jax.sharding import NamedSharding, PartitionSpec as P
sharding = NamedSharding(mesh, P("shard", None))

def mk(x):
    return jax.make_array_from_process_local_data(sharding, x, (n_dev, L))

alive = pack(np.ones(n_local, bool), False)
survive_full = np.asarray(
    distributed_survive(
        mesh,
        mk(pack(lo_l, np.uint32(0))), mk(pack(hi_l, np.uint32(0))),
        mk(pack(asm_l, np.int32(-1))), mk(alive), n_asm,
    )
)
mine = survive_full.reshape(n_dev, L)[4 * pid : 4 * pid + 4].reshape(-1)[:n_local]

# ship each worker's SURVIVING stream entries to every process (hash sets,
# not counts): pad to the agreed width for the host-level gather
ns = int(mine.sum())
def packs(x, fill):
    buf = np.full(4 * L, fill, x.dtype)
    buf[:ns] = x[mine]
    return buf
gathered = multihost_utils.process_allgather(
    np.stack([
        packs(lo_l, np.uint32(0)).view(np.int32),
        packs(hi_l, np.uint32(0)).view(np.int32),
        packs(asm_l, np.int32(-1)),
        packs(ctg_l, np.int32(-1)),
        packs(pos_l, np.int32(-1)),
    ])
)
if pid == 0:
    arr = np.asarray(gathered)  # (2, 5, 4*L)
    lo_g = arr[:, 0].reshape(-1).view(np.uint32)
    hi_g = arr[:, 1].reshape(-1).view(np.uint32)
    asm_g = arr[:, 2].reshape(-1)
    ctg_g = arr[:, 3].reshape(-1)
    pos_g = arr[:, 4].reshape(-1)
    keep = asm_g >= 0
    lo_g, hi_g = lo_g[keep], hi_g[keep]
    asm_g, ctg_g, pos_g = asm_g[keep], ctg_g[keep], pos_g[keep]
    hash_g = lo_g.astype(np.uint64) | (hi_g.astype(np.uint64) << np.uint64(32))

    from ntjoin_tpu.core.assembly import AssemblySketch
    from ntjoin_tpu.core.config import ScaffoldConfig
    from ntjoin_tpu.core.scaffolder import Scaffolder

    tsvs = [f"{{fa}}.k{{k}}.w{{w}}.tsv".format(fa=fa, k=k, w=w) for fa in fastas]
    cache = {{}}
    for a, tsv in enumerate(tsvs):
        sel = asm_g == a
        # restore the assembly's original stream order: emitted minimizer
        # positions are strictly increasing within a record
        order = np.lexsort((pos_g[sel], ctg_g[sel]))
        cache[tsv] = AssemblySketch.from_stream(
            tsv, 1.0, names[a],
            hash_g[sel][order], pos_g[sel][order].astype(np.int64),
            ctg_g[sel][order],
        )
    os.chdir(work)
    cfg = ScaffoldConfig(
        references=[tsvs[0]], target=tsvs[1], target_weight=1.0,
        reference_weights=[2.0], prefix="dist", n=2, k=k, w=w,
        overlap=False, agp=True, verbose=False,
    )
    Scaffolder(cfg, sketch_cache=cache).run()
print("WORKER_DONE", pid, flush=True)
'''


def test_two_process_scaffold_byte_equal(tmp_path):
    """Record-sharded 2-process run: collective filter -> host-0 scaffold,
    artifacts byte-equal to the single-process pipeline (VERDICT item 4)."""
    import shutil

    ref_dir = "/root/reference/tests"
    for f in ("ref.fa", "scaf.f-f.fa"):
        shutil.copy(os.path.join(ref_dir, f), tmp_path / f)

    # single-process ground truth via the CLI
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-m", "ntjoin_tpu.cli", "assemble", "-B",
         "backend=numpy", "target=scaf.f-f.fa", "target_weight=1",
         "references=ref.fa", "reference_weights=2", "prefix=single",
         "k=32", "w=1000", "n=2", "overlap=False", "agp=True"],
        cwd=tmp_path, env=env, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(
        _SCAFFOLD_WORKER.format(
            repo=REPO, coord=f"localhost:{port}", work=str(tmp_path)
        )
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=dict(os.environ),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err
        assert "WORKER_DONE" in out

    for suffix in (".path", ".agp", ".mx.dot"):
        single = (tmp_path / ("single" + suffix)).read_text()
        dist = (tmp_path / ("dist" + suffix)).read_text()
        assert dist == single.replace("single", "dist"), f"{suffix} differs"
