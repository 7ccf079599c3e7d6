#!/usr/bin/env python
"""CLI entry point; see attention_lvcsr_tpu/cli/run.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from attention_lvcsr_tpu.cli.run import main

if __name__ == "__main__":
    main()
