json = require("encoding/json")
print(json.marshal(action))
