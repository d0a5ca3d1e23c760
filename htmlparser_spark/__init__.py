"""PySpark-native main-content extraction engine (reference: chendesheng/HTMLParser)."""
