"""placeholder — implemented in the schemes milestone"""
