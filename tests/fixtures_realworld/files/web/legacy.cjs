// CommonJS module, the dominant pre-ESM Node shape: exports.<name>
// assignments declare the module's public members.
'use strict'

const path = require('path')
const { readAll } = require('./store.js')

exports.loadConfig = function (root) {
  return readAll(path.join(root, 'config.json'))
}

exports.merge = (base, extra) => {
  return Object.assign({}, base, extra)
}

module.exports.watch = async (root, onChange) => {
  const cfg = exports.loadConfig(root)
  onChange(cfg)
}

// re-exporting an existing binding is NOT a declaration
module.exports = { loadConfig: exports.loadConfig, helpers: exports }
