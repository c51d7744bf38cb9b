"""Entry point mirroring the reference's ``python inference.py`` CLI
(/root/reference/inference.py)."""

from trajectorycrafter_tpu.cli import main

if __name__ == "__main__":
    main()
