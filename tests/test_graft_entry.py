"""Driver-contract tests: dryrun_multichip runs on the virtual CPU mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)
