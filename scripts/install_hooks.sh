#!/bin/sh
# Install the versioned git hooks into .git/hooks (hooks are not
# tracked by git itself, so each clone runs this once).
cd "$(git rev-parse --show-toplevel)" || exit 1
cp scripts/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed pre-commit hook"
