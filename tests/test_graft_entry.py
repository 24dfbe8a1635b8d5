"""Driver-contract tests: dryrun_multichip runs on the virtual CPU mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    # (2-device variant verified manually; one full-model CPU compile is
    # already the most expensive test in the suite.)
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
