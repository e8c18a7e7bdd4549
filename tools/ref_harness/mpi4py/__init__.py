# In-repo mpi4py shim: thread-backed MPI emulation for executing the
# UNMODIFIED reference package (/root/reference/pyDNMFk) without OpenMPI.
# Each MPI rank is a Python thread; collectives are shared-slot exchanges
# guarded by threading.Barrier. See MPI.py for the semantics contract.
#
# This package must shadow the (absent) real mpi4py: the harness inserts
# its parent directory at sys.path[0].
from . import MPI  # noqa: F401
