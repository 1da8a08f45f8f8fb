#!/bin/sh
# Install the freeze-gate pre-commit hook (see scripts/freeze_check.py).
cd "$(dirname "$0")/.." || exit 1
cp scripts/hooks/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
