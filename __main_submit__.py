"""spark-submit entry shim: spark-submit needs a file, not ``-m``.

Delegates to logstash_spark.__main__ (same CLI flags).
"""

import sys

from logstash_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
