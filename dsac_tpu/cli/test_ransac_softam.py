"""Soft-argmax evaluation (test_ransac_softam.cpp)."""

from dsac_tpu.cli.test_ransac import main as _main


def main(argv=None):
    return _main(argv, softam=True)


if __name__ == "__main__":
    main()
