"""Native (C++) host-format fast path, loaded via ctypes.

The reference's host format layer is C with OpenMP (`src/csr2tile.h`,
`src/tile2csr.h`); this module provides the same role for this framework:
`native/csr2tile.cpp` compiled on first use with g++ into a cached shared
library. The NumPy implementations in models/tile.py remain the reference
semantics and the fallback (set SPGEMM_TPU_NATIVE=0 to force them).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "csr2tile.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libspgemmtile.so")

_lock = threading.Lock()
_lib = None
_tried = False

I32 = ctypes.POINTER(ctypes.c_int32)
U32 = ctypes.POINTER(ctypes.c_uint32)
F64 = ctypes.POINTER(ctypes.c_double)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctype)


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"spgemm_tpu: native build failed ({e}); using NumPy converters",
              file=sys.stderr)
        return None
    return _LIB


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("SPGEMM_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            print(f"spgemm_tpu: native load failed ({e})", file=sys.stderr)
            return None
        lib.csr2tile_count.restype = ctypes.c_int64
        _lib = lib
        return _lib


def csr_to_tiles_native(csr, tm: int, tn: int):
    """Native csr2tile; returns a TileMat or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from spgemm_tpu.models.csr import INDEX_DTYPE
    from spgemm_tpu.models.tile import MASK_DTYPE, TileMat, cdiv

    m, n = csr.shape
    gm = cdiv(m, tm)
    mw = cdiv(tn, 32)
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int32)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int32)
    data = np.ascontiguousarray(csr.data, dtype=np.float64)
    # the C code trusts these invariants — a malformed CSR would read out
    # of bounds, so validate at the ctypes boundary
    if indptr.size != m + 1 or int(indptr[-1]) != indices.size \
            or indices.size != data.size:
        raise ValueError(
            f"malformed CSR: indptr has {indptr.size} entries for m={m}, "
            f"indptr[-1]={int(indptr[-1])}, nnz={indices.size}"
        )

    tptr = np.zeros(gm + 1, dtype=np.int32)
    nt = int(lib.csr2tile_count(
        _ptr(indptr, I32), _ptr(indices, I32),
        ctypes.c_int64(m), ctypes.c_int64(n),
        ctypes.c_int64(tm), ctypes.c_int64(tn),
        _ptr(tptr, I32),
    ))

    # Only mask needs pre-zeroing (fill |='s bits into it); every other
    # array is fully written by csr2tile_fill, and the zeroing of rc/val
    # alone was ~48 MB of memset per cant-scale conversion.
    trow = np.empty(nt, dtype=np.int32)
    tcol = np.empty(nt, dtype=np.int32)
    tnnz_ptr = np.empty(nt + 1, dtype=np.int32)
    rowptr = np.empty((nt, tm + 1), dtype=np.int32)
    mask = np.zeros((nt, tm, mw), dtype=MASK_DTYPE)
    rc = np.empty(csr.nnz, dtype=np.int32)
    val = np.empty(csr.nnz, dtype=np.float64)
    lib.csr2tile_fill(
        _ptr(indptr, I32), _ptr(indices, I32), _ptr(data, F64),
        ctypes.c_int64(m), ctypes.c_int64(n),
        ctypes.c_int64(tm), ctypes.c_int64(tn),
        _ptr(tptr, I32),
        _ptr(trow, I32), _ptr(tcol, I32), _ptr(tnnz_ptr, I32),
        _ptr(rowptr, I32), _ptr(mask, U32), _ptr(rc, I32), _ptr(val, F64),
    )
    return TileMat(
        shape=(m, n), tm=tm, tn=tn,
        trow=trow.astype(INDEX_DTYPE, copy=False),
        tcol=tcol.astype(INDEX_DTYPE, copy=False),
        tptr=tptr.astype(INDEX_DTYPE, copy=False),
        tnnz_ptr=tnnz_ptr.astype(INDEX_DTYPE, copy=False),
        rc=rc, val=val, mask=mask, rowptr=rowptr,
    )


def tiles_to_csr_native(t):
    """Native tile2csr; returns a CSR or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from spgemm_tpu.models.csr import CSR

    indptr = np.zeros(t.m + 1, dtype=np.int32)
    indices = np.zeros(t.nnz, dtype=np.int32)
    data = np.zeros(t.nnz, dtype=np.float64)
    lib.tile2csr(
        _ptr(np.ascontiguousarray(t.trow, np.int32), I32),
        _ptr(np.ascontiguousarray(t.tcol, np.int32), I32),
        _ptr(np.ascontiguousarray(t.tnnz_ptr, np.int32), I32),
        _ptr(np.ascontiguousarray(t.rowptr, np.int32), I32),
        _ptr(np.ascontiguousarray(t.rc, np.int32), I32),
        _ptr(np.ascontiguousarray(t.val, np.float64), F64),
        ctypes.c_int64(t.nt), ctypes.c_int64(t.m),
        ctypes.c_int64(t.tm), ctypes.c_int64(t.tn),
        _ptr(indptr, I32), _ptr(indices, I32), _ptr(data, F64),
    )
    return CSR(indptr, indices, data, t.shape)


I64 = ctypes.POINTER(ctypes.c_int64)


def gustavson_symbolic_native(a, b, block_rows: int, max_b: int,
                              nt_a_pad: int, max_cblock_min: int = 1):
    """Native symbolic phase for the strip SpGEMM kernel. Returns
    (c_tptr, ctrow, ctcol, slots, gather_idx, max_cblock, nt_c) or None
    if the library is unavailable.

    slots is sized nt_a_pad*max_b and prefilled with max_cblock (the
    kernel's garbage slot); only real (tile, y<cnt_b) pairs are written.
    """
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "gustavson_symbolic_count"):
        return None
    lib.gustavson_symbolic_count.restype = ctypes.c_int64

    gm, gn_c = a.gm, b.gn
    tptr_a = np.ascontiguousarray(a.tptr, dtype=np.int32)
    tcol_a = np.ascontiguousarray(a.tcol, dtype=np.int32)
    tptr_b = np.ascontiguousarray(b.tptr, dtype=np.int32)
    tcol_b = np.ascontiguousarray(b.tcol, dtype=np.int32)

    c_tptr = np.zeros(gm + 1, dtype=np.int32)
    nt_c = int(lib.gustavson_symbolic_count(
        _ptr(tptr_a, I32), _ptr(tcol_a, I32),
        ctypes.c_int64(gm), ctypes.c_int64(gn_c),
        _ptr(tptr_b, I32), _ptr(tcol_b, I32),
        _ptr(c_tptr, I32),
    ))

    starts = np.minimum(
        np.append(np.arange(0, gm, block_rows), gm), gm
    ).astype(np.int64)
    per_c = np.diff(c_tptr.astype(np.int64)[starts])
    max_cblock = max(max_cblock_min,
                     int(per_c.max()) if per_c.size else 1)

    ctrow = np.zeros(nt_c, dtype=np.int32)
    ctcol = np.zeros(nt_c, dtype=np.int32)
    slots = np.full(nt_a_pad * max_b, max_cblock, dtype=np.int32)
    gather_idx = np.zeros(nt_c, dtype=np.int64)
    lib.gustavson_symbolic_fill(
        _ptr(tptr_a, I32), _ptr(tcol_a, I32),
        ctypes.c_int64(gm), ctypes.c_int64(gn_c),
        _ptr(tptr_b, I32), _ptr(tcol_b, I32),
        _ptr(c_tptr, I32),
        ctypes.c_int64(block_rows), ctypes.c_int64(max_cblock),
        ctypes.c_int64(max_b),
        _ptr(ctrow, I32), _ptr(ctcol, I32), _ptr(slots, I32),
        _ptr(gather_idx, I64),
    )
    return c_tptr, ctrow, ctcol, slots, gather_idx, max_cblock, nt_c


def esc_symbolic_native(a, b, s_slots: int, f_max: int, w_min: int):
    """Native symbolic for the digit-ESC engine (ops/esc.py): C pattern,
    per-interval product counts, and the padded per-class operand-stream
    fill. Returns (c_indptr i64, c_indices i32, flops, prod_cnt i64,
    asrc, bsrc, slot, layout) or None if unavailable; `layout` is the
    _sibling_layout result the fill was written against."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "esc_pattern_count"):
        return None
    lib.esc_pattern_count.restype = ctypes.c_int64
    lib.esc_products_count.restype = ctypes.c_int64

    m, n = a.m, b.n
    ai = np.ascontiguousarray(a.indptr, np.int32)
    aj = np.ascontiguousarray(a.indices, np.int32)
    bi = np.ascontiguousarray(b.indptr, np.int32)
    bj = np.ascontiguousarray(b.indices, np.int32)

    c_indptr = np.zeros(m + 1, np.int32)
    nnz_c = int(lib.esc_pattern_count(
        _ptr(ai, I32), _ptr(aj, I32), _ptr(bi, I32), _ptr(bj, I32),
        ctypes.c_int64(m), ctypes.c_int64(n), _ptr(c_indptr, I32)))

    n_int = max(1, -(-nnz_c // s_slots))
    c_indices = np.zeros(nnz_c, np.int32)
    prod_cnt = np.zeros(n_int, np.int64)
    flops = int(lib.esc_products_count(
        _ptr(ai, I32), _ptr(aj, I32), _ptr(bi, I32), _ptr(bj, I32),
        ctypes.c_int64(m), ctypes.c_int64(n), _ptr(c_indptr, I32),
        _ptr(c_indices, I32), ctypes.c_int64(s_slots),
        _ptr(prod_cnt, I64)))

    from spgemm_tpu.ops.esc import _sibling_layout

    layout = _sibling_layout(prod_cnt, nnz_c, s_slots, f_max, w_min)
    asrc = np.full(layout["flat_total"], -1, np.int32)
    bsrc = np.zeros(layout["flat_total"], np.int32)
    slot = np.zeros(layout["flat_total"], np.int32)
    av = np.zeros(layout["flat_total"], np.float64)
    bv = np.zeros(layout["flat_total"], np.float64)
    if flops:
        ad = np.ascontiguousarray(a.data, np.float64)
        bd = np.ascontiguousarray(b.data, np.float64)
        lib.esc_fill(
            _ptr(ai, I32), _ptr(aj, I32), _ptr(bi, I32), _ptr(bj, I32),
            _ptr(ad, F64), _ptr(bd, F64),
            ctypes.c_int64(m), ctypes.c_int64(n), _ptr(c_indptr, I32),
            _ptr(c_indices, I32), ctypes.c_int64(s_slots),
            ctypes.c_int64(f_max),
            _ptr(layout["sib_ptr"], I64), _ptr(layout["sib_base"], I64),
            ctypes.c_int64(n_int),
            _ptr(asrc, I32), _ptr(bsrc, I32), _ptr(slot, I32),
            _ptr(av, F64), _ptr(bv, F64))
    return (c_indptr.astype(np.int64), c_indices, flops, prod_cnt,
            asrc, bsrc, slot, layout, av, bv)


_libc = None


def madvise_hugepage(*arrays):
    """Advise the kernel to back these numpy arrays with transparent
    hugepages (THP is in `madvise` mode on this host). First-touch page
    faulting measured 0.8 GB/s with 4 KB pages vs 2.2 GB/s with THP, and
    random 4 B writes 7 M/s vs 49 M/s — the difference is TLB reach.
    No-op on failure; safe on any private anonymous mapping."""
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
            _libc.madvise.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
        except OSError:
            _libc = False
    if not _libc:
        return
    page = 4096
    for arr in arrays:
        addr = arr.ctypes.data
        start = (addr + page - 1) & ~(page - 1)
        end = (addr + arr.nbytes) & ~(page - 1)
        if end > start:
            _libc.madvise(start, end - start, 14)  # MADV_HUGEPAGE


def _madvise_populate_write(addr: int, nbytes: int) -> None:
    """madvise(MADV_POPULATE_WRITE): synchronously fault-in + write-map
    a region. On this host it populates provisioned tmpfs pages at
    ~16 GB/s, vs paying the minor faults inside the consumer's NT-store
    loop at ~4 GB/s (each fault flushes the write-combining buffers) or
    ~0.4 GB/s when the page also needs VMM provisioning. No-op on
    failure (pre-5.14 kernels reject advice 23)."""
    global _libc
    if _libc is None:
        madvise_hugepage()  # initializes _libc
    if not _libc:
        return
    page = 4096
    start = (addr + page - 1) & ~(page - 1)
    end = (addr + nbytes) & ~(page - 1)
    if end > start:
        _libc.madvise(start, end - start, 23)  # MADV_POPULATE_WRITE


_POOL: list = []

# per-stage TSC totals of the most recent esc_scan_build (profiling aid)
last_scan_build_stages: dict | None = None

# Shared-memory arena backing the pool. On this host (Firecracker VM
# with lazily host-backed guest memory) the FIRST touch of any
# guest-physical page since VM boot is provisioned by the VMM at only
# ~40-95 MB/s, while already-backed pages stream at 2-8 GB/s — and
# anonymous memory freed at process exit returns to the guest buddy
# allocator with no guarantee the next process gets the provisioned
# pages back (measured: sometimes it does at 4+ GB/s, sometimes a
# fresh-looking region crawls at 40 MB/s again). A tmpfs file pins the
# provisioned pages in the guest page cache by NAME, so every process
# after the first attaches warm: measured 2.1 GB/s on a second
# process's first pass and 8 GB/s after (vs 0.04-0.09 GB/s cold anon).
# The provisioning cost is paid once per VM boot instead of once per
# process — this is what killed round 3's 480 s prewarm cliff.
_ARENA_PATH = os.environ.get(
    "SPGEMM_POOL_FILE", "/dev/shm/spgemm_tpu_arena_v1")
_ARENA_MAX = int(os.environ.get("SPGEMM_POOL_MAX_GB", "100")) << 30
# NOTE: the file and its carves are virtual (sparse tmpfs + writers
# populate only the prefixes they touch) — the cap bounds address
# space, not RAM. Plan planes are sized at loose upper bounds whose
# pow2 caps can sum to >60 GB at cant scale while touching ~5 GB; a
# 40 GB cap pushed those carves onto cold anonymous memory.
_arena_mm = None       # the mmap object, or False if unavailable
_arena_off = 0         # carve cursor (bytes)
_arena_fd = -1
# Sidecar recording which arena ranges have ever been resident ("off len"
# lines) — pool_boot_provision re-populates them so every plan build runs
# on provisioned pages no matter which process touched them first. The
# carve cursor itself is useless for this: pow2 caps make it a sparse
# VIRTUAL bound (measured 70 GB cursor for ~15 GB touched), and populating
# untouched pages would materialize them for nothing.
_ARENA_HWM_PATH = _ARENA_PATH + ".hwm"
_boot_thread = None    # the one-per-process background provisioner
_exit_scan_armed = False


def _arena_attach():
    """mmap the tmpfs arena file (create + size on first use). Returns
    the mmap object or False if unavailable (no /dev/shm, disabled via
    SPGEMM_POOL=anon, or another live process holds the flock — two
    concurrent processes must not share scratch)."""
    global _arena_mm, _arena_fd
    if _arena_mm is not None:
        return _arena_mm
    if os.environ.get("SPGEMM_POOL", "shm") != "shm":
        _arena_mm = False
        return _arena_mm
    import fcntl
    import mmap as _mmap

    fd = -1
    try:
        fd = os.open(_ARENA_PATH, os.O_RDWR | os.O_CREAT, 0o600)
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        # tmpfs files are sparse: size to the cap up front (pages
        # materialize on first touch), mmap once for process lifetime
        if os.fstat(fd).st_size < _ARENA_MAX:
            os.ftruncate(fd, _ARENA_MAX)
        _arena_mm = _mmap.mmap(fd, _ARENA_MAX)
        _arena_fd = fd  # keeps fd + flock alive for process lifetime
    except (OSError, ValueError):
        if fd >= 0:
            try:
                os.close(fd)
            except OSError:
                pass
        _arena_mm = False
    return _arena_mm


def _new_buffer(cap: int):
    """A cap-byte pool buffer: carved from the shared arena when it
    fits, anonymous (THP-advised) otherwise. Deliberately NOT populated
    here: plan-array requests are sized at loose upper bounds (the scan
    planes' r_ub can be 10x the touched rows at cant scale), so eager
    population would write tens of GB nobody touches — writers populate
    the exact ranges they stream into instead (esc_scan_build's chunked
    MADV_POPULATE_WRITE ahead of its NT flush; pool_array for zero/fill
    requests).

    Each carve is a SEPARATE np.frombuffer over the mmap, never a slice
    of one big arena array: numpy collapses view chains through ndarray
    bases, so a slice-of-a-slice would point its .base past the carved
    buffer at the top-level array — and pool_array's getrefcount
    liveness check would see every checked-out buffer as free (measured:
    two live pool arrays handed the same memory). frombuffer's base is
    the mmap object, where the collapse stops, so each carve anchors its
    own view chain exactly like an owning np.empty buffer does."""
    global _arena_off, _exit_scan_armed
    mm = _arena_attach()
    if mm is not False and _arena_off + cap <= len(mm):
        buf = np.frombuffer(mm, np.uint8, count=cap, offset=_arena_off)
        _arena_off += cap
        if not _exit_scan_armed:
            _exit_scan_armed = True
            import atexit

            atexit.register(_hwm_save)
        return buf
    buf = np.empty(cap, np.uint8)
    madvise_hugepage(buf)
    return buf


def _arena_base() -> int:
    return np.frombuffer(_arena_mm, np.uint8, count=1).ctypes.data


def _resident_ranges(upto: int) -> list[tuple[int, int]]:
    """(offset, length) runs of resident arena pages in [0, upto),
    via mincore — the ground truth for which pages this boot has
    provisioned, independent of who touched them or how."""
    global _libc
    if _libc is None:
        madvise_hugepage()  # initializes _libc
    if not _libc:
        return []
    try:
        _libc.mincore.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                  ctypes.c_char_p]
    except AttributeError:
        return []
    base = _arena_base()
    page = 4096
    ranges: list[tuple[int, int]] = []
    chunk = 1 << 32
    for off in range(0, upto, chunk):
        ln = min(chunk, upto - off)
        npg = (ln + page - 1) // page
        vec = ctypes.create_string_buffer(npg)
        if _libc.mincore(base + off, ln, vec) != 0:
            continue
        bits = np.frombuffer(vec, np.uint8, count=npg) & 1
        edge = np.diff(np.concatenate(([0], bits, [0])))
        for s, e in zip(np.flatnonzero(edge == 1),
                        np.flatnonzero(edge == -1)):
            start = off + int(s) * page
            length = int(e - s) * page
            if ranges and ranges[-1][0] + ranges[-1][1] == start:
                ranges[-1] = (ranges[-1][0], ranges[-1][1] + length)
            else:
                ranges.append((start, length))
    return ranges


def _hwm_read() -> list[tuple[int, int]]:
    try:
        out = []
        with open(_ARENA_HWM_PATH) as f:
            for line in f:
                off, ln = line.split()
                out.append((int(off), int(ln)))
        return out
    except (OSError, ValueError):
        return []


def _hwm_save() -> None:
    """atexit: union this process's resident arena ranges into the
    sidecar (atomic rename; the arena flock serializes writers)."""
    if not _arena_mm or _arena_off <= 0:
        return
    try:
        spans = _hwm_read() + _resident_ranges(_arena_off)
        spans.sort()
        merged: list[list[int]] = []
        for off, ln in spans:
            if merged and off <= merged[-1][0] + merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], off + ln - merged[-1][0])
            else:
                merged.append([off, ln])
        tmp = _ARENA_HWM_PATH + f".{os.getpid()}"
        with open(tmp, "w") as f:
            f.writelines(f"{off} {ln}\n" for off, ln in merged)
        os.replace(tmp, _ARENA_HWM_PATH)
    except (OSError, ValueError):
        pass


def pool_boot_provision(wait: bool = False) -> int:
    """Populate the arena ranges previous processes had resident.

    Host-memory model (see _arena_attach): the VMM provisions each
    guest page ONCE per VM boot at ~0.13 GB/s; already-provisioned
    tmpfs pages re-populate into a new process at ~17 GB/s. Round 3
    paid that one-time cost as a 480 s cliff inside the first timed
    plan build. This runs it up front instead: synchronously when the
    pages are warm (sub-second per 10 GB), in a daemon thread when the
    boot is fresh (the cost overlaps matrix load / TPU tunnel waits).
    Tools call wait=True before their timed regions. Returns the byte
    count provisioned (0 when there is no arena or no recorded state).
    Disable with SPGEMM_POOL_BOOT=0."""
    global _boot_thread
    if os.environ.get("SPGEMM_POOL_BOOT", "1") == "0":
        return 0
    mm = _arena_attach()
    if mm is False:
        return 0
    spans = [(off, ln) for off, ln in _hwm_read()
             if 0 <= off and off + ln <= len(mm)]
    total = sum(ln for _, ln in spans)
    if total <= 0:
        return 0
    if _boot_thread is not None:
        if wait:
            _boot_thread.join()
        return total
    base = _arena_base()
    chunk = 256 << 20
    t0 = time.perf_counter()
    first_off, first_ln = spans[0]
    head = min(chunk, first_ln)
    _madvise_populate_write(base + first_off, head)
    warm = (time.perf_counter() - t0) < 0.5
    rest = [(first_off + head, first_ln - head)] + spans[1:]

    def _populate_rest():
        for off, ln in rest:
            for o in range(off, off + ln, chunk):
                _madvise_populate_write(base + o, min(chunk, off + ln - o))

    if warm or wait:
        _populate_rest()
        return total
    _boot_thread = threading.Thread(target=_populate_rest, daemon=True,
                                    name="spgemm-pool-provision")
    _boot_thread.start()
    return total


def pool_array(shape, dtype, *, zero: bool = False, fill=None):
    """Process-level big-buffer pool over the shared-memory arena (see
    _arena_attach for the host-memory model). numpy frees large arrays
    with munmap, so without a pool every plan build re-pays page
    population. Buffers here are never unmapped; one is reused when no
    references outside the pool remain (checked via sys.getrefcount on
    the base buffer — plan arrays returned to callers keep their buffer
    checked out until the plan is dropped)."""
    import sys

    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
    best = None
    for buf in _POOL:
        if buf.nbytes >= nbytes and sys.getrefcount(buf) == 3:
            # 3 == pool entry + loop variable + getrefcount argument
            if best is None or buf.nbytes < best.nbytes:
                best = buf
    if best is None:
        cap = 1 << max(20, (max(nbytes, 1) - 1).bit_length())
        best = _new_buffer(cap)
        _POOL.append(best)
    arr = best[:nbytes].view(dtype).reshape(shape)
    if zero or fill is not None:
        # the fill touches every byte anyway: populate first (16 GB/s
        # on provisioned tmpfs) so the fill's stores hit mapped pages
        # instead of minor-faulting per 4 KB (~4 GB/s)
        _madvise_populate_write(best.ctypes.data, nbytes)
        arr.fill(0 if zero else fill)
    return arr


def pool_prewarm(nbytes: int, parts: int = 4,
                 part_cap: int | None = None) -> None:
    """Populate ~nbytes of pool memory up front, so the first plan
    build's timed region doesn't include page population. With the
    shared arena this is one sparse touch (one write per 4 KB page) of
    the arena prefix — minor faults onto page-cache pages on a warm
    boot (~2-4 GB/s), VMM provisioning once per VM boot. parts/part_cap
    are kept for the anon-fallback path, where each buffer's CAPACITY
    must cover the largest single plan-array request (pow2-rounded) or
    the first build allocates fresh unfaulted buffers."""
    mm = _arena_attach()
    if mm is not False:
        pool_boot_provision(wait=True)  # prior processes' carve ranges
        want = min(max(nbytes, part_cap or 0), len(mm))
        view = np.frombuffer(mm, np.uint8, count=want)
        _madvise_populate_write(view.ctypes.data, want)
        return
    per = 1 << max(20, (max(nbytes // parts, 1) - 1).bit_length())
    cap = per if part_cap is None else \
        1 << max(20, (max(part_cap, per) - 1).bit_length())
    held = []
    for _ in range(parts):
        buf = pool_array((cap,), np.uint8)
        buf[:per].fill(0)  # fault only the expected touched prefix
        held.append(buf)
    del held


def esc_plan_request_bytes(a, b, group_rows: int = 1) -> int:
    """Largest single pool_array request (bytes) the scan-plan build
    will make for (a, b) — pool_prewarm's part_cap must cover this or
    the first build allocates fresh (unfaulted) buffers and pays the
    host's ~11 s/GB first-touch cost inside the timed region. Mirrors
    esc_scan_symbolic_native's r_ub / ub_total bounds."""
    blen = np.diff(np.asarray(b.indptr, np.int64))
    aj = np.asarray(a.indices, np.int64)
    ai = np.asarray(a.indptr, np.int64)
    cs0 = np.zeros(aj.size + 1, np.int64)
    np.cumsum(blen[aj], out=cs0[1:])
    flops = int(cs0[-1])
    from spgemm_tpu.ops.esc import SCAN_BLK

    row_f = cs0[ai[1:]] - cs0[ai[:-1]]
    ub_total = max(1, int(np.minimum(row_f, b.n).sum()))
    n_win_ub = ub_total // 128 + 1
    r_ub = (flops + 127) // 128 + n_win_ub * group_rows + SCAN_BLK
    return max(r_ub * 128 * 4, ub_total * 4, (n_win_ub + 1) * 8)


def esc_scan_symbolic_native(a, b, keep_sources: bool = True,
                             group_rows: int = 1):
    """Native symbolic for the scan-mode ESC kernel (ops/esc.py
    ScanPlan): dest-sorted (R, 128) row layout, run-start index map.
    keep_sources=False skips the a_src/b_src maps (write streams the
    one-shot f32 multiply doesn't need). Returns the
    _esc_scan_symbolic_numpy tuple or None.

    ONE native call (esc_scan_build): symbolic walk, incremental window
    layout and the sequential-write fill are fused — see the design
    notes in native/csr2tile.cpp and tools/profile_esc_plan.py.
    c_indices and the planes are pool-backed (pool_array) and sized at
    cheap upper bounds; untouched tail pages cost nothing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "esc_scan_build"):
        return None
    lib.esc_scan_build.restype = ctypes.c_int64

    m, n = a.m, b.n
    ai = np.ascontiguousarray(a.indptr, np.int32)
    aj = np.ascontiguousarray(a.indices, np.int32)
    bi = np.ascontiguousarray(b.indptr, np.int32)
    bj = np.ascontiguousarray(b.indices, np.int32)

    # per-row product counts -> F and the nnzC upper bound (vectorized)
    blen = np.diff(bi.astype(np.int64))
    cs0 = np.zeros(aj.size + 1, np.int64)
    np.cumsum(blen[aj], out=cs0[1:])
    flops = int(cs0[-1])
    from spgemm_tpu.ops.esc import SCAN_BLK

    if flops == 0:
        # empty product stream: mirror the NumPy fallback's layout
        # (SCAN_BLK-padded zero planes, single empty window)
        zf = np.zeros((SCAN_BLK, 128), np.float32)
        zi = np.zeros((SCAN_BLK, 128), np.int32)
        asrc = bsrc = (zi if keep_sources else None)
        return (np.zeros(m + 1, np.int64), np.zeros(0, np.int32), 0,
                zf, zi, np.zeros(2, np.int64), asrc, bsrc, 1)

    row_f = cs0[ai[1:].astype(np.int64)] - cs0[ai[:-1].astype(np.int64)]
    ub_total = max(1, int(np.minimum(row_f, n).sum()))
    n_win_ub = ub_total // 128 + 1
    # every window may pad up to group_rows-1 extra rows
    r_ub = ((flops + 127) // 128 + n_win_ub * group_rows + SCAN_BLK)

    c_indptr = np.zeros(m + 1, np.int32)
    c_indices = pool_array((ub_total,), np.int32)
    # planes arrive UNINITIALIZED: esc_scan_build writes every row in
    # [0, r_total) exactly once via its NT-store arena flush (a
    # host-side pre-zero over the loose r_ub bound cost multi-GB
    # memsets — 40+ s at cant scale). Only the [r_total:r_pad] tail is
    # cleared here after the call.
    qv = pool_array((r_ub, 128), np.float32)
    meta = pool_array((r_ub, 128), np.int32)
    if keep_sources:
        asrc = pool_array((r_ub, 128), np.int32)
        bsrc = pool_array((r_ub, 128), np.int32)
    else:
        asrc = bsrc = np.zeros(1, np.int32)  # dummy target
    win_rowptr_buf = pool_array((n_win_ub + 1,), np.int64)
    stats = np.zeros(8, np.int64)  # [0]=max_run [1]=r_total [2:7]=stage tsc
    ad = np.ascontiguousarray(a.data, np.float64)
    bd = np.ascontiguousarray(b.data, np.float64)
    nnz_c = int(lib.esc_scan_build(
        _ptr(ai, I32), _ptr(aj, I32), _ptr(bi, I32), _ptr(bj, I32),
        _ptr(ad, F64), _ptr(bd, F64),
        ctypes.c_int64(m), ctypes.c_int64(n),
        _ptr(c_indptr, I32), _ptr(c_indices, I32),
        _ptr(qv, F32), _ptr(meta, I32),
        _ptr(asrc, I32), _ptr(bsrc, I32),
        ctypes.c_int64(1 if keep_sources else 0),
        ctypes.c_int64(group_rows),
        ctypes.c_int64(r_ub),
        _ptr(win_rowptr_buf, I64), _ptr(stats, I64)))

    # stage breakdown (TSC tick totals; fractions locate the hot stage —
    # read by tools/profile_esc_plan.py)
    global last_scan_build_stages
    last_scan_build_stages = dict(zip(
        ("walk", "extract", "layout", "scatter", "flush"),
        (int(v) for v in stats[2:7])))

    n_win = max(1, -(-nnz_c // 128))
    win_rowptr = win_rowptr_buf[: n_win + 1]
    # pad R to the kernel block multiple; clear the (<= SCAN_BLK-row)
    # tail the native build never touched (the trim's win_rowptr never
    # reaches it, but the kernels stream it)
    r_total = int(stats[1])
    r_pad = -(-r_total // SCAN_BLK) * SCAN_BLK
    qv, meta = qv[:r_pad], meta[:r_pad]
    qv[r_total:] = 0.0
    meta[r_total:] = 0
    if keep_sources:
        asrc, bsrc = asrc[:r_pad], bsrc[:r_pad]
        asrc[r_total:] = -1
        bsrc[r_total:] = 0
    else:
        asrc = bsrc = None
    return (c_indptr.astype(np.int64), c_indices[:nnz_c], flops, qv, meta,
            win_rowptr, asrc, bsrc, max(1, int(stats[0])))


U16 = ctypes.POINTER(ctypes.c_uint16)
F32 = ctypes.POINTER(ctypes.c_float)


def esc_refresh_qv_native(asrc, bsrc, a_data, b_data, out=None):
    """Fused gather-multiply-round refresh of a ScanPlan's qv plane
    (pattern fixed, new values). Returns the f32 plane or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "esc_refresh_qv"):
        return None
    asrc = np.ascontiguousarray(asrc, np.int32)
    bsrc = np.ascontiguousarray(bsrc, np.int32)
    ad = np.ascontiguousarray(a_data, np.float64)
    bd = np.ascontiguousarray(b_data, np.float64)
    if out is None:
        out = pool_array(asrc.shape, np.float32)
    lib.esc_refresh_qv(
        _ptr(asrc, I32), _ptr(bsrc, I32), _ptr(ad, F64), _ptr(bd, F64),
        ctypes.c_int64(asrc.size), _ptr(out, F32))
    return out


def esc_refresh_dd_native(asrc, bsrc, a_data, b_data):
    """Double-double refresh: exact f64 products split into (hi, lo)
    f32 planes. Returns (hi, lo) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "esc_refresh_dd"):
        return None
    asrc = np.ascontiguousarray(asrc, np.int32)
    bsrc = np.ascontiguousarray(bsrc, np.int32)
    ad = np.ascontiguousarray(a_data, np.float64)
    bd = np.ascontiguousarray(b_data, np.float64)
    hi = pool_array(asrc.shape, np.float32)
    lo = pool_array(asrc.shape, np.float32)
    lib.esc_refresh_dd(
        _ptr(asrc, I32), _ptr(bsrc, I32), _ptr(ad, F64), _ptr(bd, F64),
        ctypes.c_int64(asrc.size), _ptr(hi, F32), _ptr(lo, F32))
    return hi, lo


def esc_gather_planes_native(asrc, bsrc, a_data, b_data):
    """Separate (av, bv) f32 operand planes for the in-kernel-multiply
    scan variant. Returns (av, bv) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "esc_gather_planes"):
        return None
    asrc = np.ascontiguousarray(asrc, np.int32)
    bsrc = np.ascontiguousarray(bsrc, np.int32)
    ad = np.ascontiguousarray(a_data, np.float64)
    bd = np.ascontiguousarray(b_data, np.float64)
    av = pool_array(asrc.shape, np.float32)
    bv = pool_array(asrc.shape, np.float32)
    lib.esc_gather_planes(
        _ptr(asrc, I32), _ptr(bsrc, I32), _ptr(ad, F64), _ptr(bd, F64),
        ctypes.c_int64(asrc.size), _ptr(av, F32), _ptr(bv, F32))
    return av, bv


def pack_a_tiles_native(a, max_ablock: int):
    """Native packing of A's dense tile blocks (f32 + bf16 occupancy).
    Returns (a_val, a_occ) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pack_tiles_dense"):
        return None
    import jax.numpy as _jnp

    tm, tk = a.tm, a.tn
    tnnz_a = np.ascontiguousarray(a.tnnz_ptr, dtype=np.int32)
    rc_a = np.ascontiguousarray(a.rc, dtype=np.int32)
    val_a = np.ascontiguousarray(a.val, dtype=np.float64)
    a_val = np.zeros((a.nt + max_ablock, tm, tk), dtype=np.float32)
    a_occ16 = np.zeros((a.nt + max_ablock, tm, tk), dtype=np.uint16)
    lib.pack_tiles_dense(
        _ptr(tnnz_a, I32), _ptr(rc_a, I32), _ptr(val_a, F64),
        ctypes.c_int64(a.nt), ctypes.c_int64(tm * tk),
        _ptr(a_val, F32), _ptr(a_occ16, U16),
    )
    return a_val, a_occ16.view(_jnp.bfloat16)


I8 = ctypes.POINTER(ctypes.c_int8)


def ozaki_scales_native(t, axis: int):
    """Per-row (axis=0) or per-column (axis=1) |v| maxima of a TileMat,
    shape (gdim*span,) f64 — the scale pass of ops/ozaki.py's
    _scales_and_slices_prep, from tile CSR (no dense cube). None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ozaki_absmax"):
        return None
    span = t.tm if axis == 0 else t.tn
    gdim = t.gm if axis == 0 else t.gn
    owner = np.ascontiguousarray(t.trow if axis == 0 else t.tcol, np.int32)
    tnnz = np.ascontiguousarray(t.tnnz_ptr, np.int32)
    rc = np.ascontiguousarray(t.rc, np.int32)
    val = np.ascontiguousarray(t.val, np.float64)
    out = np.zeros(gdim * span, np.float64)
    lib.ozaki_absmax(
        _ptr(tnnz, I32), _ptr(rc, I32), _ptr(val, F64), _ptr(owner, I32),
        ctypes.c_int64(t.nt), ctypes.c_int64(t.tn),
        ctypes.c_int64(span), ctypes.c_int64(axis), _ptr(out, F64))
    return out


def ozaki_span_native(t, axis: int, exps: np.ndarray):
    """(bit span, |v| max, nonzero |v| min) of a TileMat against its
    scale exponents — ops/ozaki.py:_span_slices plus the extreme-span
    routing stats, from tile CSR. None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ozaki_span"):
        return None
    span = t.tm if axis == 0 else t.tn
    owner = np.ascontiguousarray(t.trow if axis == 0 else t.tcol, np.int32)
    tnnz = np.ascontiguousarray(t.tnnz_ptr, np.int32)
    rc = np.ascontiguousarray(t.rc, np.int32)
    val = np.ascontiguousarray(t.val, np.float64)
    e = np.ascontiguousarray(exps, np.int64)
    out3 = np.zeros(3, np.float64)
    lib.ozaki_span(
        _ptr(tnnz, I32), _ptr(rc, I32), _ptr(val, F64), _ptr(owner, I32),
        ctypes.c_int64(t.nt), ctypes.c_int64(t.tn),
        ctypes.c_int64(span), ctypes.c_int64(axis), _ptr(e, I64),
        _ptr(out3, F64))
    return int(out3[0]), float(out3[1]), float(out3[2])


def ozaki_slice_a_native(t, sa: int, stack_rows: int, ea: np.ndarray,
                         av8: np.ndarray) -> bool:
    """Write A's int8 digit stacks av8[t, s*tm + r, c] straight from
    tile CSR (av8 pre-zeroed, (nt_pad, stack_rows, tk)). False if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ozaki_slice_a"):
        return False
    tnnz = np.ascontiguousarray(t.tnnz_ptr, np.int32)
    rc = np.ascontiguousarray(t.rc, np.int32)
    val = np.ascontiguousarray(t.val, np.float64)
    trow = np.ascontiguousarray(t.trow, np.int32)
    e = np.ascontiguousarray(ea, np.int64)
    lib.ozaki_slice_a(
        _ptr(tnnz, I32), _ptr(rc, I32), _ptr(val, F64), _ptr(trow, I32),
        ctypes.c_int64(t.nt), ctypes.c_int64(t.tm), ctypes.c_int64(t.tn),
        ctypes.c_int64(sa), ctypes.c_int64(stack_rows), _ptr(e, I64),
        _ptr(av8, I8))
    return True


def ozaki_slice_b_native(t, max_b: int, sb: int, eb: np.ndarray,
                         bv8: np.ndarray) -> bool:
    """Write B's int8 digit stacks bv8[k, r, (s*max_b + y)*tn + c]
    straight from tile CSR (bv8 pre-zeroed, (gk_pad, tk, sb*max_b*tn)).
    False if the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ozaki_slice_b"):
        return False
    tptr = np.ascontiguousarray(t.tptr, np.int32)
    tnnz = np.ascontiguousarray(t.tnnz_ptr, np.int32)
    rc = np.ascontiguousarray(t.rc, np.int32)
    val = np.ascontiguousarray(t.val, np.float64)
    tcol = np.ascontiguousarray(t.tcol, np.int32)
    e = np.ascontiguousarray(eb, np.int64)
    lib.ozaki_slice_b(
        _ptr(tptr, I32), _ptr(tnnz, I32), _ptr(rc, I32), _ptr(val, F64),
        _ptr(tcol, I32), ctypes.c_int64(t.gm), ctypes.c_int64(t.tm),
        ctypes.c_int64(t.tn), ctypes.c_int64(max_b), ctypes.c_int64(sb),
        _ptr(e, I64), _ptr(bv8, I8))
    return True


def pack_strip_operands_native(a, b, max_ablock: int, max_b: int):
    """Native packing of the strip kernel's device operands: A dense
    blocks (f32 + bf16 occupancy) and stacked B slabs. Returns
    (a_val, a_occ, b_val, b_occ) or None if unavailable.

    Occupancy buffers are uint16 carrying the bfloat16 bit pattern of
    1.0 (0x3F80) and are reinterpreted via .view(bfloat16) by the
    caller's dtype machinery."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pack_tiles_dense"):
        return None
    import jax.numpy as _jnp

    tm, tk, tn = a.tm, a.tn, b.tn
    packed_a = pack_a_tiles_native(a, max_ablock)
    if packed_a is None:
        return None
    a_val, a_occ = packed_a

    tptr_b = np.ascontiguousarray(b.tptr, dtype=np.int32)
    tnnz_b = np.ascontiguousarray(b.tnnz_ptr, dtype=np.int32)
    rc_b = np.ascontiguousarray(b.rc, dtype=np.int32)
    val_b = np.ascontiguousarray(b.val, dtype=np.float64)
    gk = b.gm
    b_val = np.zeros((gk, tk, max_b * tn), dtype=np.float32)
    b_occ16 = np.zeros((gk, tk, max_b * tn), dtype=np.uint16)
    lib.pack_b_slabs(
        _ptr(tptr_b, I32), _ptr(tnnz_b, I32), _ptr(rc_b, I32),
        _ptr(val_b, F64),
        ctypes.c_int64(gk), ctypes.c_int64(tk), ctypes.c_int64(tn),
        ctypes.c_int64(max_b),
        _ptr(b_val, F32), _ptr(b_occ16, U16),
    )
    bf16 = _jnp.bfloat16
    return (a_val, a_occ, b_val, b_occ16.view(bf16))
