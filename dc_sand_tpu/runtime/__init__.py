"""Streaming runtime (C12, C21): delay/weight state, chunked runner,
checkpoint/resume.

The reference world's "runtime" is: allocate buffers, launch kernels in
sequence at real-time rate, ship results on (SURVEY.md §2.1).  Here the
equivalent is a host loop over one jitted SPMD step with donated carry:
fetch chunk -> pipeline -> emit, carrying FIR history, coarse-delay
lead-in and visibility accumulators across chunks (BASELINE.json:5
"real time").  Failure semantics match a streaming correlator: restart at
any chunk boundary from persisted state; in-flight integrations drop
(SURVEY.md §5).
"""

from .delays import DelayModel  # noqa: F401
from .runner import FXRunner, RunnerCounters  # noqa: F401
from .checkpoint import save_state, load_state  # noqa: F401
from .ingest import (NativeIngest, SpeadTransmitter,  # noqa: F401
                     spead_packetize, multi_ingest_source)

