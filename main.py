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
    args, _ = parser.parse_known_args()

    config_dict = {}
    quick_start(
        model=args.model,
        dataset=args.dataset,
        config_dict=config_dict,
        save_model=True,
        mg=args.mg,
        max_epochs=args.epochs,
    )
