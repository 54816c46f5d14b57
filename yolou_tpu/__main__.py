"""`python -m yolou_tpu <command>` — CLI dispatcher."""

import sys

COMMANDS = {
    "train-decoder": "yolou_tpu.cli.train_decoder",
    "train-detector": "yolou_tpu.cli.train_detector",
    "evaluate": "yolou_tpu.cli.evaluate",
    "predict": "yolou_tpu.cli.predict",
    "val": "yolou_tpu.cli.val",
    "convert": "yolou_tpu.cli.convert",
    "export": "yolou_tpu.cli.export",
    "generate-objectmaps": "yolou_tpu.cli.generate_objectmaps",
    "generate-heatmaps": "yolou_tpu.cli.generate_heatmaps",
    "visualize-logits": "yolou_tpu.cli.visualize_logits",
    "profile": "yolou_tpu.cli.profile",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m yolou_tpu <command> [args]\ncommands:")
        for c in COMMANDS:
            print(f"  {c}")
        return 0
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; options: {', '.join(COMMANDS)}")
        return 2
    import importlib

    mod = importlib.import_module(COMMANDS[cmd])
    return mod.main(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main() or 0)
