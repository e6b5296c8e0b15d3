"""Main entry. Parity with reference `src/main.py:16-27`:
``python main.py --model DiffMM --dataset baby``."""

import argparse

from genmmrec_tpu.quick_start import quick_start

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="DiffMM", help="name of models")
    parser.add_argument("--dataset", "-d", type=str, default="baby", help="name of datasets")
    parser.add_argument("--mg", action="store_true", help="mirror-gradient training")
    parser.add_argument("--epochs", type=int, default=None, help="override epoch count")
    parser.add_argument(
        "--config-json", type=str, default=None,
        help="config overrides: inline JSON dict or a path to a JSON file",
    )
    args, _ = parser.parse_known_args()

    config_dict = {}
    if args.config_json:
        import json

        if args.config_json.lstrip().startswith("{"):
            config_dict.update(json.loads(args.config_json))
        else:
            with open(args.config_json) as f:
                config_dict.update(json.load(f))
    quick_start(
        model=args.model,
        dataset=args.dataset,
        config_dict=config_dict,
        save_model=True,
        mg=args.mg,
        max_epochs=args.epochs,
    )
    # the remote-chip tunnel's client subprocess can wedge the interpreter
    # in its exit handlers (observed: completed runs stuck in do_wait);
    # all results are logged and artifacts written, so exit hard
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(0)
