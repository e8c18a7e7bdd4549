"""Thread-backed emulation of the mpi4py.MPI surface used by the reference.

Purpose: execute the UNMODIFIED reference package (lanl/pyDNMFk at
/root/reference) with p ranks in one process, so its end-to-end goldens
(examples/dist_pynmfk_2d_Swim.py:53 `nopt == 16`,
examples/dist_pynmfk_1d_wtsi.py:44 `nopt == 4`) can actually be executed
in an environment without OpenMPI/mpi4py.

Exact API surface reproduced (complete inventory of the reference's MPI
usage, from SURVEY.md §2.3; verified by grep over /root/reference):

  MPI.COMM_WORLD                    (rank resolved per-thread via TLS)
  comm.Get_rank / Get_size / .rank / .size
  comm.Create_cart(dims, periods, reorder)   dist_comm.py:22
  cart.Get_coords(rank)                      dist_comm.py:23,36,50
  cart.Sub(remain_dims)                      dist_comm.py:34,48
  comm.allreduce(obj, op=SUM)                ~30 sites (pyobj, left-fold
                                             in rank order like mpi4py's
                                             reduce+bcast implementation)
  comm.allgather(obj)                        dist_nmf.py:163,195,285,289
  comm.Reduce_scatter(send, recv, op=SUM)    dist_nmf.py:169,202,315,341
                                             (recvcounts=None -> equal
                                             recvbuf-sized chunks)
  comm.bcast(obj, root) / Bcast(buf, root)   pyDNMF.py:121,129; dist_svd
  comm.scatter(objs, root)                   reference tests only
  comm.barrier() / Barrier() / Free()
  MPI.Wtime, MPI.SUM/MIN/MAX/PROD

Semantics notes (the load-bearing details):
  * Object allreduce folds contributions in rank order (result =
    ((r0+r1)+r2)+... ), matching mpi4py's object-path reduce-at-root.
    Float32 sums are therefore deterministic run-to-run here; real
    OpenMPI buffer reductions may associate differently in the last ulp.
  * Reduce_scatter sums the (flattened) sendbufs across the group, then
    writes the rank-th recvbuf.size-sized contiguous chunk into recvbuf
    (mpi4py's recvcounts=None behavior for equal-size recvbufs).
  * Cartesian topology: reorder=False, rank = row-major over dims.
    Sub(remain_dims) groups ranks sharing the dropped coordinates,
    ordered by the remaining coordinates (== global rank order).
  * Receivers of object collectives get pickle-roundtripped copies so a
    later in-place mutation on one thread cannot alias another rank's
    buffer (process isolation emulation).

Per-rank numpy RNG isolation (np.random.seed(pert*1000) identical on all
ranks, pyDNMFk.py:228,32) is handled by the harness's thread-local
numpy.random patch, not here — see run_reference.py.
"""

import pickle
import threading
import time

import numpy as np

# ---------------------------------------------------------------- op sentinels
SUM = "sum"
MIN = "min"
MAX = "max"
PROD = "prod"

_FOLD = {
    SUM: lambda a, b: a + b,
    MIN: lambda a, b: np.minimum(a, b) if isinstance(a, np.ndarray) else min(a, b),
    MAX: lambda a, b: np.maximum(a, b) if isinstance(a, np.ndarray) else max(a, b),
    PROD: lambda a, b: a * b,
}


def Wtime():
    return time.perf_counter()


_TLS = threading.local()


def _set_thread_rank(rank):
    """Called by the harness at the top of each rank-thread."""
    _TLS.rank = rank


def _copy(obj):
    return pickle.loads(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL))


class _Ctx:
    """Shared state for one communicator group (global rank list).

    Slot exchange is double-buffered (phases tracked per-rank in TLS; they
    agree across ranks because every collective is SPMD-ordered).  Each
    collective ends with a completion barrier (Comm methods call sync()
    after reading peer slots) so a sender can never return and mutate its
    live send buffer while a receiver still copies it — matching real MPI
    completion semantics.
    """

    def __init__(self, world_ranks):
        self.world_ranks = list(world_ranks)  # group-local idx -> world rank
        self.n = len(self.world_ranks)
        self.barrier = threading.Barrier(self.n)
        self.slots = [[None] * self.n, [None] * self.n]
        self.child_lock = threading.Lock()
        self.children = {}  # key -> _Ctx, built collectively

    def _phase(self):
        phases = getattr(_TLS, "phases", None)
        if phases is None:
            phases = _TLS.phases = {}
        key = id(self)  # ctxs are never freed, so ids are stable
        p = phases.get(key, 0)
        phases[key] = p ^ 1
        return p

    def exchange(self, local_rank, obj):
        """Deposit obj in my slot; after the barrier the returned buffer is
        stable until the collective-after-next (double buffering)."""
        buf = self.slots[self._phase()]
        buf[local_rank] = obj
        self.barrier.wait()
        return buf

    def sync(self):
        self.barrier.wait()

    def make_children(self, local_rank, key, member_world_ranks):
        """Collectively create (or fetch) child contexts. Every group member
        calls with its own key; whichever member takes the lock first
        instantiates all of them. Returns the child ctx for `key`."""
        view = self.exchange(local_rank, (key, tuple(member_world_ranks)))
        with self.child_lock:
            for k, members in view:
                if k not in self.children:
                    self.children[k] = _Ctx(members)
            child = self.children[key]
        self.sync()  # no rank may proceed until all have fetched
        return child


class Comm:
    """Per-rank communicator handle (rank fixed at construction), except
    COMM_WORLD whose rank is resolved per-thread from TLS."""

    def __init__(self, ctx, rank=None):
        self._ctx = ctx
        self._rank = rank
        self._epoch = [0]  # distinguishes repeated child creations (Free/Sub cycles)

    # -- rank/size ------------------------------------------------------
    def Get_rank(self):
        return self._rank if self._rank is not None else _TLS.rank

    def Get_size(self):
        return self._ctx.n

    @property
    def rank(self):
        return self.Get_rank()

    @property
    def size(self):
        return self._ctx.n

    # -- collectives ----------------------------------------------------
    def barrier(self):
        self._ctx.sync()

    Barrier = barrier

    def allreduce(self, obj, op=SUM):
        fold = _FOLD[op]
        view = self._ctx.exchange(self.Get_rank(), obj)
        acc = view[0]
        for x in view[1:]:
            acc = fold(acc, x)
        if self._ctx.n == 1:
            acc = _copy(acc)  # avoid aliasing the sender's object
        self._ctx.sync()  # MPI completion semantics: no rank returns (and
        # may mutate its live send buffer) until all have read the slots
        return acc

    def allgather(self, obj):
        me = self.Get_rank()
        view = self._ctx.exchange(me, obj)
        out = [view[i] if i == me else _copy(view[i]) for i in range(self._ctx.n)]
        self._ctx.sync()
        return out

    def bcast(self, obj, root=0):
        me = self.Get_rank()
        view = self._ctx.exchange(me, obj if me == root else None)
        out = view[root] if me == root else _copy(view[root])
        self._ctx.sync()
        return out

    def Bcast(self, buf, root=0):
        me = self.Get_rank()
        view = self._ctx.exchange(me, buf if me == root else None)
        if me != root:
            np.copyto(buf, view[root])
        self._ctx.sync()

    def scatter(self, objs, root=0):
        me = self.Get_rank()
        view = self._ctx.exchange(me, objs if me == root else None)
        item = view[root][me]
        out = item if me == root else _copy(item)
        self._ctx.sync()
        return out

    def Reduce_scatter(self, sendbuf, recvbuf, recvcounts=None, op=SUM):
        # mpi4py recvcounts=None path: equal recvbuf-sized contiguous chunks
        # (dist_nmf.py:169,202,315,341 always calls it this way).
        assert recvcounts is None, "shim supports the reference's None path only"
        send = np.ascontiguousarray(sendbuf)
        if send.size != recvbuf.size * self._ctx.n:
            raise ValueError(
                f"Reduce_scatter size mismatch: send {send.size} != "
                f"{recvbuf.size} * {self._ctx.n}")
        fold = _FOLD[op]
        view = self._ctx.exchange(self.Get_rank(), send)
        acc = view[0]
        for x in view[1:]:
            acc = fold(acc, x)
        me = self.Get_rank()
        chunk = acc.ravel()[me * recvbuf.size:(me + 1) * recvbuf.size]
        recvbuf[...] = chunk.reshape(recvbuf.shape).astype(recvbuf.dtype, copy=False)
        self._ctx.sync()

    # -- topology -------------------------------------------------------
    def Create_cart(self, dims, periods=None, reorder=False):
        me = self.Get_rank()
        key = ("cart", self._next_epoch(), tuple(dims))
        ctx = self._ctx.make_children(me, key, self._ctx.world_ranks)
        return CartComm(ctx, me, tuple(dims))

    def Free(self):
        pass

    def _next_epoch(self):
        # Per-rank creation counter so repeated identical Sub/Create_cart
        # calls (PyNMF.fit -> comm.Free() -> fresh Subs every fit,
        # pyDNMF.py:165 / dist_comm.py:53-56) map to fresh contexts.
        # Stored in TLS keyed by ctx id: COMM_WORLD is a shared handle, so
        # an instance counter would race across rank-threads.
        counters = getattr(_TLS, "epoch_counters", None)
        if counters is None:
            counters = _TLS.epoch_counters = {}
        key = id(self._ctx)
        counters[key] = counters.get(key, 0) + 1
        return counters[key]


class CartComm(Comm):
    def __init__(self, ctx, rank, dims):
        super().__init__(ctx, rank)
        self._dims = dims

    def Get_coords(self, rank):
        coords = []
        for stride in self._strides():
            coords.append(rank // stride)
            rank = rank % stride
        return coords

    def _strides(self):
        strides = []
        s = 1
        for d in reversed(self._dims):
            strides.append(s)
            s *= d
        return list(reversed(strides))

    def Sub(self, remain_dims):
        me = self.Get_rank()
        my_coords = self.Get_coords(me)
        dropped = tuple(c for c, keep in zip(my_coords, remain_dims) if not keep)
        kept_dims = tuple(d for d, keep in zip(self._dims, remain_dims) if keep)
        # Members: all cart ranks sharing my dropped coords, ordered by
        # remaining coords == global rank order (row-major, reorder=False).
        members = []
        for r in range(self._ctx.n):
            rc = self.Get_coords(r)
            if tuple(c for c, keep in zip(rc, remain_dims) if not keep) == dropped:
                members.append(self._ctx.world_ranks[r])
        key = ("sub", self._next_epoch(), tuple(remain_dims), dropped)
        ctx = self._ctx.make_children(me, key, members)
        sub_rank = members.index(self._ctx.world_ranks[me])
        return CartComm(ctx, sub_rank, kept_dims)


_world_ctx = None
COMM_WORLD = None


def _init_world(n):
    """Harness entry: build an n-rank world before spawning rank threads."""
    global _world_ctx, COMM_WORLD
    _world_ctx = _Ctx(list(range(n)))
    COMM_WORLD = Comm(_world_ctx, rank=None)
    return COMM_WORLD
