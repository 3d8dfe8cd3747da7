"""Driver entry-point regression: the multi-chip dry run must keep compiling
and executing on a virtual device mesh (the driver invokes it the same way)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_2():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)
