// Legacy CommonJS store kept for the migration period.
const fs = require('fs');
const path = require('path');

var DB_FILE = path.join(__dirname, 'tasks.jsonl');

function readAll() {
  const text = fs.readFileSync(DB_FILE, 'utf8');
  return text.split('\n').filter(Boolean).map(JSON.parse);
}

async function query(filter) {
  const rows = readAll();
  return rows.filter((row) => row.status === filter.status);
}

const save = function (rows) {
  fs.writeFileSync(DB_FILE, rows.map(JSON.stringify).join('\n'));
};

let counter = 0;

const nextId = () => {
  counter += 1;
  return counter;
};

module.exports = {query, save, nextId};
